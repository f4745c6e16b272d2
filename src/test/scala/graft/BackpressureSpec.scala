package graft

import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.sql.functions._

import graft.plan.TsStore
import graft.serve.ApiHttp

/** Slow-client backpressure on `/api/query` (reference contract:
  * akumulid/httpserver.cpp:15-34 — the HTTP cursor pulls 64 KiB at a
  * time, so a stalled client stalls the CURSOR, never the heap).
  * [[ApiHttp]] serves through `toLocalIterator`, which pulls ONE result
  * partition per scheduler job, only when the stream consumes it: with
  * a reader that stops consuming, the blocking socket write must halt
  * partition consumption after at most one partition + the TCP buffers.
  * That is the serving-JVM memory bound stated in scheduler terms —
  * rows can never accumulate driver-side, at most one partition is
  * resident — and unlike heap sampling it is GC-noise-free: the spec
  * counts completed Spark jobs while the client stalls, then proves the
  * remaining result partitions run only AFTER the client resumes.
  * The request is HTTP/1.0, so the response is close-framed (no chunked
  * envelope) and the drained byte stream is exactly the CSV payload. */
class BackpressureSpec extends SparkFunSuite {

  private val N = 2000000L // ~90 MB of CSV — far beyond any socket buffer
  private val T0 = 1700000000000000000L

  test("stalled /api/query reader halts partition jobs; resume drains all rows") {
    val sp = spark
    val oldShuffle = sp.conf.get("spark.sql.shuffle.partitions")
    val oldAdvisory =
      sp.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    // ~45 result partitions of ~2 MB: run-ahead would be visible as
    // dozens of jobs completing while the client sleeps
    sp.conf.set("spark.sql.shuffle.partitions", "64")
    sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    val jobsEnded = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobsEnded.incrementAndGet()
    }
    sp.sparkContext.addSparkListener(listener)
    val giant = sp.range(N).select(
      lit("bp").as("metric"),
      map(lit("host"), lit("g0")).as("tags"),
      (lit(T0) + col("id") * 1000000000L).as("ts"),
      col("id").cast("double").as("value"))
    val srv = new ApiHttp(new TsStore(giant), port = 0)
    srv.start()
    val sock = new Socket()
    try {
      val body = s"""{"select":"bp","range":{"from":$T0,""" +
        s""""to":${T0 + N * 1000000000L}},"output":{"format":"csv"}}"""
      // a small client receive window tightens how much a stalled
      // reader can absorb before the server's write blocks
      sock.setReceiveBufferSize(16 * 1024)
      sock.connect(new InetSocketAddress("127.0.0.1", srv.boundPort))
      val out = sock.getOutputStream
      out.write((s"POST /api/query HTTP/1.0\r\n" +
        s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" + body)
        .getBytes(UTF_8))
      out.flush()
      val in = sock.getInputStream
      // read a first sliver (status line + headers + some rows), STALL
      val sliver = new Array[Byte](32 * 1024)
      var got = 0
      while (got < sliver.length) {
        val r = in.read(sliver, got, sliver.length - got)
        require(r > 0, "stream ended before the stall point")
        got += r
      }
      val head = new String(sliver, 0, 512, UTF_8)
      assert(head.startsWith("HTTP/1.0 200") || head.startsWith("HTTP/1.1 200"),
        head.takeWhile(_ != '\r'))
      Thread.sleep(4000) // server must be blocked on the socket by now
      val stallJobs = jobsEnded.get()
      val heapMb = (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) >> 20
      Console.err.println(s"BACKPRESSURE stall: jobs=$stallJobs heapMB=$heapMb")
      // resume: drain everything, counting payload lines in-flight
      // (never holding more than one 64 KiB read buffer)
      val bodyStart = {
        val idx = new String(sliver, UTF_8).indexOf("\r\n\r\n")
        require(idx > 0, "no header/body boundary in first sliver")
        idx + 4
      }
      var lines = 0L
      var i = bodyStart
      val buf = sliver
      var r = got
      while (r > 0) {
        while (i < r) {
          if (buf(i) == '\n') lines += 1
          i += 1
        }
        r = in.read(buf)
        i = 0
      }
      val drainJobs = jobsEnded.get()
      Console.err.println(s"BACKPRESSURE drained: jobs=$drainJobs lines=$lines")
      assert(lines == N, s"client must receive every row: $lines != $N")
      // the core contract: most result partitions ran only after resume
      assert(drainJobs >= stallJobs + 5,
        s"partition jobs must follow the client, not run ahead " +
          s"(stall=$stallJobs drain=$drainJobs)")
    } finally {
      sock.close()
      srv.stop()
      sp.sparkContext.removeSparkListener(listener)
      sp.conf.set("spark.sql.shuffle.partitions", oldShuffle)
      oldAdvisory match {
        case Some(v) =>
          sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", v)
        case None =>
          sp.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
    }
  }
}
