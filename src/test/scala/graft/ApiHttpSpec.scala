package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.serve.ApiHttp

/** Real localhost round-trips through the HTTP runtime (reference:
  * akumulid/httpserver.cpp POST streaming endpoints + GET resources). */
class ApiHttpSpec extends SparkFunSuite {
  import SparkSpec._

  private lazy val st = store(Seq(
    ("cpu", Map("host" -> "a"), 1500000000L, 2.5),
    ("cpu", Map("host" -> "a"), 2500000000L, 3.5),
    ("cpu", Map("host" -> "b"), 1500000000L, 7.0),
    ("mem", Map("host" -> "a"), 1500000000L, 9.0)))

  private def withServer[T](f: Int => T): T = {
    val srv = new ApiHttp(st, port = 0)
    srv.start()
    try f(srv.boundPort) finally srv.stop()
  }

  private def http(port: Int, path: String, method: String,
                   body: String = ""): (Int, String) =
    HttpTest.http(port, path, method, body)

  test("POST /api/query streams chunked CSV lines") {
    withServer { port =>
      val (code, text) = http(port, "/api/query", "POST",
        """{"select":"cpu","range":{"from":0,"to":10000000000},
          |"output":{"format":"csv"}}""".stripMargin)
      assert(code == 200)
      val lines = text.split("\r\n").toSeq
      assert(lines == Seq(
        "cpu host=a,19700101T000001.500000000,2.5",
        "cpu host=b,19700101T000001.500000000,7",
        "cpu host=a,19700101T000002.500000000,3.5"))
    }
  }

  test("POST /api/query without output clause defaults to RESP") {
    withServer { port =>
      val (code, text) = http(port, "/api/query", "POST",
        """{"select":"mem","range":{"from":0,"to":10000000000}}""")
      assert(code == 200)
      assert(text.startsWith("+mem host=a\r\n+19700101T000001.500000000\r\n+9\r\n"))
    }
  }

  test("POST /api/suggest and /api/search stream plain name lines") {
    withServer { port =>
      val (c1, t1) = http(port, "/api/suggest", "POST",
        """{"select":"metric-names"}""")
      assert(c1 == 200 && t1.split("\r\n").toSeq == Seq("cpu", "mem"))
      val (c2, t2) = http(port, "/api/search", "POST",
        """{"select":"cpu","where":{"host":["a"]}}""")
      assert(c2 == 200 && t2.split("\r\n").toSeq == Seq("cpu host=a"))
      // regex form (PlainSeriesMatcher::regex_match) over canonical names
      val (c3, t3) = http(port, "/api/search", "POST",
        """{"regex":"cpu host=.*"}""")
      assert(c3 == 200 &&
        t3.split("\r\n").toSeq == Seq("cpu host=a", "cpu host=b"))
      // invalid pattern -> 400 error line, driver-side fail-fast
      val (c4, t4) = http(port, "/api/search", "POST", """{"regex":"cpu["}""")
      assert(c4 == 400 && t4.startsWith("-"))
    }
  }

  test("bad query -> 400 with -error line; bad url -> 404") {
    withServer { port =>
      val (c1, t1) = http(port, "/api/query", "POST",
        """{"select":"cpu","range":{"from":0,"to":1},"output":{"format":"xml"}}""")
      assert(c1 == 400 && t1.startsWith("-"))
      val (c2, t2) = http(port, "/api/nosuch", "POST", "{}")
      assert(c2 == 404 && t2 == "-Invalid url /api/nosuch\r\n")
      // GET on a POST endpoint is rejected like the reference
      val (c3, _) = http(port, "/api/query", "GET")
      assert(c3 == 404)
    }
  }

  test("GET /api/stats, /api/function-names, /api/version return JSON") {
    withServer { port =>
      val (c1, t1) = http(port, "/api/stats", "GET")
      assert(c1 == 200 && t1.contains("\"n_samples\":4"))
      val (c2, t2) = http(port, "/api/function-names", "GET")
      assert(c2 == 200 && t2.contains("\"ewma\"") && t2.startsWith("["))
      val (c3, t3) = http(port, "/api/version", "GET")
      assert(c3 == 200 && t3.contains("graft"))
    }
  }
}
