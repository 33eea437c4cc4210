package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Generic HTTP batch-embedding provider (reference
  * `infrastructure/openai_embedding_provider.py:24-42`), speaking the common
  * public embeddings API shape:
  *
  * {{{
  * POST <endpoint>
  *   {"model": "<name>", "input": ["text", ...]}
  * → {"data": [{"index": 0, "embedding": [0.1, ...]}, ...]}
  * }}}
  *
  * Runs inside `mapPartitions` tasks (see [[Embedding.embed]]), so the
  * request rate is executor-count × batch cadence — the scale lever the
  * reference manages with a client-side rate limiter. Responses are re-ordered
  * by `index` and length-checked strictly (`embedding_service.py:66-72`
  * raises on mismatch; so do we). Retries with exponential backoff on 429 and
  * 5xx. NOT used by any test/battery path by default — the offline
  * [[DeterministicProvider]] stays the zero-egress default; this class exists
  * so a real deployment can point at an embeddings endpoint via config.
  */
final class HttpEmbeddingProvider(
    val endpoint: String,
    override val modelName: String,
    override val dimensions: Int,
    apiKey: Option[String] = None,
    maxBatch: Int = 100,
    timeoutMs: Long = 30000L,
    maxRetries: Int = 3,
    retryBaseDelayMs: Long = 250L
) extends EmbeddingProvider {

  // the same shape gate Settings applies (reference `settings.py:123-133`):
  // a malformed key must fail at construction, not as a 401 on the first
  // batch deep inside a mapPartitions task
  apiKey.foreach { k =>
    require(k.startsWith("sk-") && k.length >= 20,
      "API key must start with 'sk-' and be at least 20 characters")
  }

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(maxBatch).flatMap(requestOnce).toSeq

  private def requestOnce(texts: Seq[String]): Seq[Array[Float]] = {
    val body = MiniJson.obj(
      "model" -> MiniJson.str(modelName),
      "input" -> ("[" + texts.map(MiniJson.str).mkString(",") + "]")
    )
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      try {
        val builder = HttpRequest.newBuilder(URI.create(endpoint))
          .timeout(Duration.ofMillis(timeoutMs))
          .header("Content-Type", "application/json")
        apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
        val resp = client.send(
          builder.POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
          HttpResponse.BodyHandlers.ofString()
        )
        if (resp.statusCode() == 200) return parse(resp.body(), texts.length)
        if (resp.statusCode() != 429 && resp.statusCode() < 500)
          throw new RuntimeException(s"embedding endpoint returned ${resp.statusCode()}: ${resp.body().take(200)}")
        lastErr = new RuntimeException(s"retryable status ${resp.statusCode()}")
      } catch {
        case e: InterruptedException => throw e
        case e: RuntimeException if e.getMessage != null && e.getMessage.startsWith("embedding endpoint") => throw e
        case e: Exception => lastErr = e
      }
      attempt += 1
      if (attempt <= maxRetries) Thread.sleep(retryBaseDelayMs * (1L << (attempt - 1)))
    }
    throw new RuntimeException(s"embedding request failed after ${maxRetries + 1} attempts", lastErr)
  }

  private def parse(body: String, expected: Int): Seq[Array[Float]] = {
    val root = MiniJson.parse(body)
    val data = root match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse("data",
        throw new RuntimeException("response has no 'data' field"))
      case _ => throw new RuntimeException("response is not a JSON object")
    }
    val rows = data match {
      case l: List[_] => l.map(_.asInstanceOf[Map[String, Any]])
      case _ => throw new RuntimeException("'data' is not an array")
    }
    val byIndex = rows.zipWithIndex.map { case (r, i) =>
      val idx = r.get("index").map(_.asInstanceOf[Double].toInt).getOrElse(i)
      val vec = r("embedding").asInstanceOf[List[Any]]
        .map(_.asInstanceOf[Double].toFloat).toArray
      idx -> vec
    }.sortBy(_._1).map(_._2)
    require(byIndex.length == expected,
      s"provider returned ${byIndex.length} vectors for $expected texts")
    byIndex.foreach(v => require(v.length == dimensions,
      s"provider returned ${v.length}-dim vector, expected $dimensions"))
    byIndex
  }
}

/** Minimal JSON encode/parse for the one API shape above — no dependencies
  * are available in this build, and the full generality of a JSON library is
  * not needed for a fixed request/response schema.
  */
private[embed] object MiniJson {

  def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').toString
  }

  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")

  /** Parse into Map[String, Any] / List[Any] / Double / String / Boolean / null. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): Any = {
      skipWs()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }
    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length), s"bad literal at $pos")
      pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var more = true
      while (more) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        b += (k -> value())
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect('}')
      b.result()
    }
    private def arr(): List[Any] = {
      expect('['); skipWs()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return Nil }
      val b = List.newBuilder[Any]
      var more = true
      while (more) {
        b += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1 else more = false
      }
      expect(']')
      b.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          require(!eof, "bad escape")
          s.charAt(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }
    private def number(): Double = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      require(pos > start, s"expected number at $start")
      s.substring(start, pos).toDouble
    }
  }
}
