package graft.embed

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Request batching / ordering / retry of the HTTP provider against a local
  * loopback stub (no egress; reference
  * `infrastructure/openai_embedding_provider.py:24-42`).
  */
class HttpEmbeddingProviderSpec extends AnyFunSuite {

  private val dim = 4

  /** Stub embeddings endpoint: vector = [len, firstChar, batchNo, idx]; data
    * rows are returned in REVERSED order with explicit indices to prove the
    * client re-orders.
    */
  private def withServer(failFirst: Int = 0)(run: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      val n = calls.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      if (n <= failFirst) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        val inputs = MiniJson.parse(body).asInstanceOf[Map[String, Any]]("input")
          .asInstanceOf[List[Any]].map(_.asInstanceOf[String])
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val rows = inputs.zipWithIndex.reverse.map { case (t, i) =>
          val v = Seq(t.length.toDouble, t.headOption.map(_.toDouble).getOrElse(0.0), n.toDouble, i.toDouble)
          s"""{"index":$i,"embedding":[${v.mkString(",")}],"auth":${MiniJson.str(auth)}}"""
        }
        val resp = s"""{"data":[${rows.mkString(",")}]}""".getBytes(UTF_8)
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      }
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}/v1/embeddings", calls)
    finally server.stop(0)
  }

  test("batches requests, re-orders by index, strict length check") {
    withServer() { (url, calls) =>
      val p = new HttpEmbeddingProvider(url, "test-model", dim, apiKey = Some("sk-test-0123456789abcdef"), maxBatch = 100)
      val texts = (1 to 250).map(i => s"t$i")
      val vecs = p.embedBatch(texts)
      assert(calls.get() == 3, "250 texts at maxBatch=100 must be 3 requests")
      assert(vecs.length == 250)
      // order restored despite the stub reversing rows: vec(0) is for texts(0)
      assert(vecs.head(0) == texts.head.length.toFloat && vecs.head(3) == 0f)
      assert(vecs(101)(3) == 1f, "second batch, second row keeps its in-batch index")
    }
  }

  test("retries 5xx with backoff, then succeeds") {
    withServer(failFirst = 2) { (url, calls) =>
      val p = new HttpEmbeddingProvider(url, "m", dim, maxRetries = 3, retryBaseDelayMs = 1L)
      val vecs = p.embedBatch(Seq("abc"))
      assert(vecs.length == 1 && vecs.head(0) == 3f)
      assert(calls.get() == 3, "two failures then one success")
    }
  }

  test("gives up after maxRetries and surfaces the failure") {
    withServer(failFirst = 10) { (url, _) =>
      val p = new HttpEmbeddingProvider(url, "m", dim, maxRetries = 1, retryBaseDelayMs = 1L)
      val e = intercept[RuntimeException](p.embedBatch(Seq("x")))
      assert(e.getMessage.contains("failed after 2 attempts"))
    }
  }

  test("MiniJson round-trips the request/response shapes incl. escapes") {
    val body = MiniJson.obj(
      "model" -> MiniJson.str("m\"x"),
      "input" -> ("[" + Seq("a\nb", "tab\there").map(MiniJson.str).mkString(",") + "]"))
    val parsed = MiniJson.parse(body).asInstanceOf[Map[String, Any]]
    assert(parsed("model") == "m\"x")
    assert(parsed("input").asInstanceOf[List[Any]] == List("a\nb", "tab\there"))
    val nums = MiniJson.parse("""{"a":[1.5,-2e3,0.25],"b":null,"c":true}""")
      .asInstanceOf[Map[String, Any]]
    assert(nums("a").asInstanceOf[List[Any]] == List(1.5, -2000.0, 0.25))
    assert(nums("b") == null && nums("c") == true)
  }
}
