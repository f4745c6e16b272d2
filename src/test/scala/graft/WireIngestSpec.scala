package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.io.{Ingest, WireIngest}

/** Wire transports: real localhost sockets -> spool files -> the RESP
  * parse/ingest pipeline (reference: akumulid/tcp_server.cpp session
  * loop; udp_server.cpp per-packet parser). */
class WireIngestSpec extends SparkFunSuite {

  private def awaitSpool(dir: java.io.File, n: Int): Unit = {
    val deadline = System.nanoTime() + 10L * 1000000000L
    while (dir.listFiles().count(_.getName.endsWith(".resp")) < n &&
           System.nanoTime() < deadline) Thread.sleep(20)
    assert(dir.listFiles().count(_.getName.endsWith(".resp")) >= n)
  }

  test("TCP: one connection = one dictionary session, published on close") {
    val spool = Files.createTempDirectory("graft-wire-tcp").toFile
    val srv = new WireIngest(spool)
    srv.start()
    try {
      val payload =
        "*2\n+cpu host=a\n:9\n" +
          (0 until 10).map(i => s":9\n:${1000000000L * i}\n+$i.5\n").mkString
      val sock = new Socket("127.0.0.1", srv.tcpBoundPort)
      sock.getOutputStream.write(payload.getBytes(UTF_8))
      sock.close() // close publishes the session
      awaitSpool(spool, 1)
      val parsed = Ingest.respFiles(spark, spool.getAbsolutePath)
      assert(parsed.count() == 10)
      assert(parsed.selectExpr("min(value)", "max(value)").collect()
        .head.toSeq == Seq(0.5, 9.5))
    } finally srv.stop()
  }

  test("UDP: per-datagram parser scope; dictionary packets isolated") {
    val spool = Files.createTempDirectory("graft-wire-udp").toFile
    val srv = new WireIngest(spool)
    srv.start()
    try {
      val udp = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      def send(s: String): Unit = {
        val b = s.getBytes(UTF_8)
        udp.send(new DatagramPacket(b, b.length, addr, srv.udpBoundPort))
      }
      // two plain data-point packets (stateless; may share a spool file)
      send("+mem host=a\n:1000\n:1\n")
      send("+mem host=b\n:2000\n:2\n")
      // a dictionary-bearing packet: its ids must not leak to others
      send("*2\n+cpu host=c\n:5\n:5\n:3000\n:3\n")
      udp.close()
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (spool.listFiles().count(_.getName.startsWith("udp-dict")) < 1 &&
             System.nanoTime() < deadline) Thread.sleep(20)
      srv.flush() // publish the rolling plain-packet file
      awaitSpool(spool, 2)
      val parsed = Ingest.respFiles(spark, spool.getAbsolutePath)
      val rows = parsed.orderBy("ts").collect()
      assert(rows.length == 3)
      assert(rows.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 2.0, 3.0))
      assert(rows.map(_.getAs[String]("metric")).toSeq ==
        Seq("mem", "mem", "cpu"))
    } finally srv.stop()
  }

  test("TCP sessions feed the full ingest path end-to-end") {
    val spool = Files.createTempDirectory("graft-wire-e2e").toFile
    val out = Files.createTempDirectory("graft-wire-out").toFile
    val srv = new WireIngest(spool)
    srv.start()
    try {
      for (c <- 0 until 3) {
        val sock = new Socket("127.0.0.1", srv.tcpBoundPort)
        val payload = (0 until 5).map(i =>
          s"+cpu host=h$c\n:${1000000000L * (c * 5 + i)}\n:${c * 5 + i}\n").mkString
        sock.getOutputStream.write(payload.getBytes(UTF_8))
        sock.close()
      }
      awaitSpool(spool, 3)
      Ingest.ingestResp(spark, spool.getAbsolutePath,
        out.getAbsolutePath, flattenTags = Seq("host"))
      val st = Ingest.readLayout(spark, out.getAbsolutePath)
      assert(st.samples.count() == 15)
      assert(st.series.count() == 3)
    } finally srv.stop()
  }
}
