package graft.lexam.pipeline

/** Pluggable LLM chat-completion client (reference
  * `backend/app/services/deepinfra.py`). The HTTP implementation lives
  * behind this seam; tests and hermetic runs inject the deterministic
  * stub (SURVEY §5.2). Instances are shipped to executors inside
  * `mapPartitions`, hence Serializable.
  */
case class LlmMessage(role: String, content: String)
case class LlmResult(content: String, inputTokens: Int, outputTokens: Int)

/** Raised for retryable upstream failures (429/5xx analog). */
class TransientLlmError(msg: String) extends RuntimeException(msg)

trait LlmClient extends Serializable {
  def complete(model: String, messages: Seq[LlmMessage],
               temperature: Double, maxTokens: Int): LlmResult
}

/** Retry with exponential backoff on transient errors: 3 attempts,
  * 2^n backoff (deepinfra.py:31,45-53). `sleepFn` injectable so tests
  * don't sleep. */
class RetryingClient(inner: LlmClient, maxAttempts: Int = 3,
                     sleepFn: Long => Unit = Thread.sleep) extends LlmClient {
  override def complete(model: String, messages: Seq[LlmMessage],
                        temperature: Double, maxTokens: Int): LlmResult = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return inner.complete(model, messages, temperature, maxTokens)
      catch {
        case e: TransientLlmError =>
          last = e; attempt += 1
          if (attempt < maxAttempts) sleepFn(1000L << attempt)
        case e: Throwable => throw e
      }
    }
    throw last
  }
}

/** Deterministic hermetic stub: output depends only on the prompt text.
  * MCQ-style prompts (mentioning the ###X### convention) get a letter
  * answer whose value is a stable hash of the prompt; judge prompts
  * (mentioning [[x.x]]) get a score; everything else gets prose. Lets
  * generation → judging → stats run end-to-end with reproducible
  * results and no network (SURVEY §5 item 2).
  */
class DeterministicStubClient(nChoices: Int = 4) extends LlmClient {
  private def stableHash(s: String): Int = {
    // FNV-1a over UTF-8 — stable across JVMs (String.hashCode is too,
    // but be explicit about the contract)
    var h = 0x811c9dc5
    s.getBytes("UTF-8").foreach(b => { h ^= (b & 0xff); h *= 0x01000193 })
    math.abs(h)
  }

  override def complete(model: String, messages: Seq[LlmMessage],
                        temperature: Double, maxTokens: Int): LlmResult = {
    val prompt = messages.map(_.content).mkString("\n")
    val h = stableHash(prompt)
    val content =
      if (prompt.contains("###X###") || prompt.contains("###"))
        s"<think>considering options</think>The answer is clear.\n###${('A' + h % nChoices).toChar}###"
      else if (prompt.contains("[[x.x]]") || prompt.contains("[["))
        s"<think>weighing</think>Reasonable attempt. [[0.${h % 10}]]"
      else
        s"Response ${h % 1000} to: ${prompt.take(40)}"
    LlmResult(content, inputTokens = prompt.length / 4,
      outputTokens = content.length / 4)
  }
}
