package graft.lexam.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import com.fasterxml.jackson.databind.ObjectMapper

/** OpenAI-compatible chat-completions client over HTTP (reference
  * `backend/app/services/deepinfra.py`): POST /chat/completions with a
  * bearer token, 120 s timeout, transient failures (429/5xx) surfaced
  * as [[TransientLlmError]] so [[RetryingClient]] applies the 3-attempt
  * exponential backoff (deepinfra.py:31,45-53).
  *
  * One client per executor JVM (lazy val in a companion-held cache):
  * instances of this case class are serialized into mapPartitions
  * tasks, the underlying HttpClient is rebuilt on the executor.
  */
case class HttpLlmClient(baseUrl: String, apiKey: String,
                         timeoutSeconds: Long = 120) extends LlmClient {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def complete(model: String, messages: Seq[LlmMessage],
                        temperature: Double, maxTokens: Int): LlmResult = {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.put("temperature", temperature)
    body.put("max_tokens", maxTokens)
    val arr = body.putArray("messages")
    messages.foreach { m =>
      val o = arr.addObject(); o.put("role", m.role); o.put("content", m.content)
    }
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$baseUrl/chat/completions"))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp =
      try http.send(req, HttpResponse.BodyHandlers.ofString())
      catch {
        case e: java.io.IOException =>
          throw new TransientLlmError(s"io error: ${e.getMessage}")
      }
    resp.statusCode() match {
      case 200 =>
        val root = mapper.readTree(resp.body())
        val content = root.path("choices").path(0).path("message")
          .path("content").asText("")
        val usage = root.path("usage")
        LlmResult(content,
          usage.path("prompt_tokens").asInt(0),
          usage.path("completion_tokens").asInt(0))
      case code if code == 429 || code >= 500 =>
        throw new TransientLlmError(s"HTTP $code: ${resp.body().take(200)}")
      case code =>
        throw new RuntimeException(s"HTTP $code: ${resp.body().take(200)}")
    }
  }
}
