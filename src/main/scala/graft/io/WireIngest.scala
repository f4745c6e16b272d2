package graft.io

import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress, ServerSocket, Socket}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Wire transports for RESP ingestion (reference: akumulid/tcp_server.cpp,
  * akumulid/udp_server.cpp). The parser layer is transport-agnostic; this
  * layer adapts push protocols to Spark's pull model by spooling COMPLETE
  * sessions as files that [[Ingest.respFiles]] / [[Ingest.ingestResp]]
  * (batch) or `StreamIngest.respFileStream` (continuous) consume —
  * file-granular micro-batching, the idiomatic Spark bridge for sockets.
  *
  * Session semantics match the reference:
  *  - TCP: one connection = one parser session (the dictionary is
  *    connection-scoped, tcp_server.cpp session loop) -> one spool file
  *    per connection, published atomically when the connection closes so
  *    consumers never see a half-written session.
  *  - UDP: every datagram gets a FRESH parser (udp_server.cpp:152-157) —
  *    datagrams carrying a dictionary (`*` prelude) become their own
  *    session file; plain data-point datagrams are stateless, so they
  *    concatenate into rolling shared files (identical parse result, far
  *    fewer files).
  */
final class WireIngest(spoolDir: File, tcpPort: Int = 0, udpPort: Int = 0) {

  spoolDir.mkdirs()
  private val tmpDir = new File(spoolDir, ".tmp"); tmpDir.mkdirs()

  private val running = new AtomicBoolean(false)
  private val seq = new AtomicLong()

  private val tcpSocket = new ServerSocket()
  tcpSocket.bind(new InetSocketAddress("127.0.0.1", tcpPort))
  private val udpSocket = new DatagramSocket(
    new InetSocketAddress("127.0.0.1", udpPort))

  def tcpBoundPort: Int = tcpSocket.getLocalPort
  def udpBoundPort: Int = udpSocket.getLocalPort

  private def publish(tmp: Path, kind: String): Unit =
    Files.move(tmp,
      new File(spoolDir, s"$kind-${seq.incrementAndGet()}.resp").toPath,
      StandardCopyOption.ATOMIC_MOVE)

  // --- TCP: session file per connection ---------------------------------
  private def handleConn(sock: Socket): Unit = {
    val tmp = Files.createTempFile(tmpDir.toPath, "tcp", ".part")
    val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile), 1 << 16)
    try {
      val in = sock.getInputStream
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      var any = false
      while (n > 0) { out.write(buf, 0, n); any = true; n = in.read(buf) }
      out.close()
      if (any) publish(tmp, "tcp") else Files.deleteIfExists(tmp)
    } catch {
      case _: java.io.IOException =>
        out.close(); Files.deleteIfExists(tmp) // reset mid-session: dropped
    } finally sock.close()
  }

  private val tcpThread = new Thread(() => {
    while (running.get()) {
      try {
        val sock = tcpSocket.accept()
        val t = new Thread(() => handleConn(sock))
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => /* closed during stop() */ }
    }
  }, "wire-tcp-accept")

  // --- UDP: fresh parser scope per datagram ------------------------------
  // plain data-point datagrams roll into a shared file; dictionary
  // datagrams are published alone to keep the per-packet parser scope
  private var udpRoll: Option[(Path, BufferedOutputStream)] = None
  private var udpRollBytes = 0L
  private val RollLimit = 8L << 20

  private def udpAppend(data: Array[Byte], len: Int): Unit = synchronized {
    if (len > 0 && data(0) == '*') { // dictionary-bearing packet
      val tmp = Files.createTempFile(tmpDir.toPath, "udp", ".part")
      val o = new BufferedOutputStream(new FileOutputStream(tmp.toFile))
      o.write(data, 0, len); o.write('\n'); o.close()
      publish(tmp, "udp-dict")
    } else {
      val (path, out) = udpRoll.getOrElse {
        val tmp = Files.createTempFile(tmpDir.toPath, "udp", ".part")
        val o = new BufferedOutputStream(new FileOutputStream(tmp.toFile), 1 << 16)
        udpRoll = Some((tmp, o)); udpRollBytes = 0L
        (tmp, o)
      }
      out.write(data, 0, len); out.write('\n')
      udpRollBytes += len + 1
      if (udpRollBytes >= RollLimit) { out.close(); publish(path, "udp"); udpRoll = None }
    }
  }

  /** Publish any partially-filled UDP roll file (tests / shutdown). */
  def flush(): Unit = synchronized {
    udpRoll.foreach { case (path, out) => out.close(); publish(path, "udp") }
    udpRoll = None
  }

  private val udpThread = new Thread(() => {
    val buf = new Array[Byte](64 << 10) // reference UDP payload bound
    val packet = new DatagramPacket(buf, buf.length)
    while (running.get()) {
      try {
        udpSocket.receive(packet)
        udpAppend(packet.getData, packet.getLength)
      } catch { case _: java.io.IOException => /* closed during stop() */ }
    }
  }, "wire-udp-recv")

  def start(): Unit = {
    running.set(true)
    tcpThread.setDaemon(true); udpThread.setDaemon(true)
    tcpThread.start(); udpThread.start()
  }

  def stop(): Unit = {
    running.set(false)
    flush()
    tcpSocket.close()
    udpSocket.close()
  }
}
