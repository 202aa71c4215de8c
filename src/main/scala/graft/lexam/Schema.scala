package graft.lexam

import java.sql.Timestamp

/** Typed schema for the five LEXam tables (reference
  * `backend/app/models.py`; Spark mapping per SURVEY §1 / FIXTURES.md §A).
  * Tri-state booleans are Option[Boolean]; `choices` is a native array.
  */
case class Question(
  id: String,
  question: String,
  course: String,
  language: String,
  area: String,
  jurisdiction: String,
  year: Int,
  n_statements: Option[Int] = None,
  none_as_an_option: Option[Boolean] = None,
  negative_question: Option[Boolean] = None,
  international: Option[Boolean] = None)

case class Variant(
  id: Long,
  question_id: String,
  config: String,
  split: String,
  choices: Option[Seq[String]] = None,
  gold: Option[Int] = None,
  answer: Option[String] = None)

/** `filter_config` JSON → typed struct (models.py:47; interpreter at
  * services/generation.py:40-63). Empty seq = dimension inactive
  * (Python falsiness of `[]`); Option for the tri-state booleans. */
case class FilterConfig(
  config: Seq[String] = Nil,
  split: Seq[String] = Nil,
  area: Seq[String] = Nil,
  language: Seq[String] = Nil,
  course: Seq[String] = Nil,
  jurisdiction: Seq[String] = Nil,
  year: Seq[Int] = Nil,
  negative_question: Option[Boolean] = None,
  international: Option[Boolean] = None)

object FilterConfig {
  /** Normalize a loose JSON-ish map into a typed FilterConfig, the way
    * the reference accepts `filter_config: dict | None` verbatim and its
    * interpreter treats falsy entries as inactive
    * (`fc.get("config") or []`, services/generation.py:43-49): missing /
    * null / empty → inactive; a bare scalar is promoted to a one-element
    * list; years accept any integral type; unknown keys are ignored. */
  def fromMap(m: Map[String, Any]): FilterConfig = {
    def strs(k: String): Seq[String] = m.get(k) match {
      case None | Some(null) => Nil
      case Some(s: String) => if (s.isEmpty) Nil else Seq(s)
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case Some(other) => Seq(other.toString)
    }
    def ints(k: String): Seq[Int] = m.get(k) match {
      case None | Some(null) => Nil
      case Some(n: Number) => Seq(n.intValue)
      case Some(xs: Seq[_]) => xs.collect { case n: Number => n.intValue }
      case Some(other) => Seq(other.toString.toInt)
    }
    def bool(k: String): Option[Boolean] = m.get(k) match {
      case Some(b: Boolean) => Some(b)
      case _ => None
    }
    FilterConfig(
      config = strs("config"), split = strs("split"), area = strs("area"),
      language = strs("language"), course = strs("course"),
      jurisdiction = strs("jurisdiction"), year = ints("year"),
      negative_question = bool("negative_question"),
      international = bool("international"))
  }
}

/** Partial update for PUT /api/experiments/{id}
  * (routers/experiments.py:115-128): a None field means "keep the
  * stored value" — the reference's `if val is not None: setattr(...)`
  * loop, which also means a stored value can never be cleared back to
  * null through this surface. */
case class ExperimentPatch(
  name: Option[String] = None,
  description: Option[String] = None,
  filter_config: Option[FilterConfig] = None,
  open_question_prompt: Option[String] = None,
  mcq_prompt: Option[String] = None,
  judge_system_prompt: Option[String] = None,
  judge_prompt: Option[String] = None,
  model_name: Option[String] = None,
  temperature: Option[Double] = None,
  max_tokens: Option[Int] = None,
  judge_temperature: Option[Double] = None,
  judge_max_tokens: Option[Int] = None,
  n_answers: Option[Int] = None)

case class Experiment(
  id: Long,
  name: String,
  description: Option[String] = None,
  filter_config: FilterConfig = FilterConfig(),
  open_question_prompt: String = Experiment.DefaultOpenPrompt,
  mcq_prompt: String = Experiment.DefaultMcqPrompt,
  judge_system_prompt: String = Experiment.DefaultJudgeSystemPrompt,
  judge_prompt: String = Experiment.DefaultJudgePrompt,
  model_name: String = "Qwen/Qwen3-14B",
  temperature: Double = 0.7,
  max_tokens: Int = 2048,
  judge_temperature: Double = 0.3,
  judge_max_tokens: Int = 4096,
  n_answers: Int = 1,
  status: String = "created",
  created_at: Option[Timestamp] = None,
  updated_at: Option[Timestamp] = None)

object Experiment {
  // Default prompt templates with the same placeholder contract as the
  // reference (models.py:48-124): {course_name}/{question} for
  // generation; {question_fact}/{ref_answer}/{model_answer} for judging.
  val DefaultOpenPrompt: String =
    "You are taking an exam in {course_name}.\n\nQuestion: {question}\n\nAnswer:"
  val DefaultMcqPrompt: String =
    "You are taking an exam in {course_name}.\n\nQuestion: {question}\n\n" +
      "Reply with the letter of the correct answer in the form ###X###."
  val DefaultJudgeSystemPrompt: String =
    "You are a strict legal examiner. Score the answer from 0.0 to 1.0."
  val DefaultJudgePrompt: String =
    "Question: {question_fact}\n\nReference answer: {ref_answer}\n\n" +
      "Model answer: {model_answer}\n\nScore in the form [[x.x]]."

  val Statuses: Seq[String] =
    Seq("created", "generating", "generated", "judging", "completed", "error")
}

case class ExperimentAnswer(
  id: Long,
  experiment_id: Long,
  variant_id: Long,
  run_index: Int,
  model_name: String,
  answer_text: String,
  extracted_letter: Option[String] = None,
  mcq_correct: Option[Boolean] = None,
  input_tokens: Int = 0,
  output_tokens: Int = 0,
  created_at: Option[Timestamp] = None)

case class ExperimentJudgment(
  id: Long,
  answer_id: Long,
  judge_model: String,
  judgment_text: String,
  score: Option[Double] = None,
  input_tokens: Int = 0,
  output_tokens: Int = 0,
  created_at: Option[Timestamp] = None)
