package graft.lexam

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import graft.lexam.pipeline._

/** HTTP client semantics against a local hermetic server: parsing,
  * bearer auth, 429 → transient → retry recovery, 400 → permanent.
  */
class HttpLlmClientSpec extends AnyFunSuite {

  private def withServer(handler: HttpExchange => Unit)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handler(ex)
    })
    server.start()
    try f(s"http://localhost:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private val okBody =
    """{"choices":[{"message":{"role":"assistant","content":"###B###"}}],
      |"usage":{"prompt_tokens":42,"completion_tokens":7}}""".stripMargin

  test("parses content and token usage; sends bearer auth") {
    var auth: String = null
    withServer { ex =>
      auth = ex.getRequestHeaders.getFirst("Authorization")
      respond(ex, 200, okBody)
    } { url =>
      val r = HttpLlmClient(url, "secret-key")
        .complete("m", Seq(LlmMessage("user", "q?")), 0.7, 128)
      assert(r.content === "###B###")
      assert(r.inputTokens === 42 && r.outputTokens === 7)
      assert(auth === "Bearer secret-key")
    }
  }

  test("429 then success: RetryingClient recovers (P3)") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() < 3) respond(ex, 429, """{"error":"rate"}""")
      else respond(ex, 200, okBody)
    } { url =>
      val client = new RetryingClient(HttpLlmClient(url, "k"), sleepFn = _ => ())
      val r = client.complete("m", Seq(LlmMessage("user", "q")), 0.0, 16)
      assert(r.content === "###B###")
      assert(calls.get() === 3)
    }
  }

  test("4xx (non-429) is permanent — no retry") {
    val calls = new AtomicInteger(0)
    withServer { ex =>
      calls.incrementAndGet(); respond(ex, 400, """{"error":"bad"}""")
    } { url =>
      val client = new RetryingClient(HttpLlmClient(url, "k"), sleepFn = _ => ())
      intercept[RuntimeException] {
        client.complete("m", Seq(LlmMessage("user", "q")), 0.0, 16)
      }
      assert(calls.get() === 1)
    }
  }

  test("drives the full generation job through HTTP (P1-P7 over a socket)") {
    val spark = graft.TestSpark.spark
    withServer { ex => respond(ex, 200, okBody) } { url =>
      val dir = java.nio.file.Files.createTempDirectory("http_store").toString
      val store = new LexamStore(spark, dir)
      Fixtures.writeTo(store)
      store.saveExperiment(Experiment(id = 11, name = "http",
        filter_config = FilterConfig(config = Seq("mcq_4_choices"))))
      val progress = new ProgressStore
      val n = Jobs.runGeneration(store, progress, HttpLlmClient(url, "k"),
        11L, parallelism = 2)
      assert(n === 2) // q1,q2 mcq_4 variants
      import org.apache.spark.sql.functions.col
      val letters = store.answers.select("extracted_letter")
        .collect().map(_.getString(0)).toSet
      assert(letters === Set("B"))
    }
  }
}
