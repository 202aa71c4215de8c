package graft.lexam

/** Hand-checkable LEXam fixture rows exercising every semantic corner
  * FIXTURES.md §A calls for: all areas/jurisdictions/both languages/3
  * years, tri-state booleans (true/false/null), multi- and single-config
  * questions, word counts at bin edges, international + domestic.
  */
object Fixtures {

  val questions: Seq[Question] = Seq(
    Question("q1", "What is consideration in contract law?", "US Business Law",
      "en", "Private", "International", 2020,
      negative_question = Some(false), international = Some(true)),
    Question("q2", "Welche Straftat liegt vor?", "Strafrecht I",
      "de", "Criminal", "Swiss", 2021,
      negative_question = Some(true), international = Some(false)),
    Question("q3", "Explain the separation of powers.", "Public Law",
      "en", "Public", "Generic", 2022,
      negative_question = None, international = Some(false)),
    Question("q4", "Was ist eine juristische Person?", "Privatrecht",
      "de", "Private", "Swiss", 2021,
      negative_question = Some(false), international = None),
    Question("q5", "Which treaty governs the sale of goods? Answer carefully.",
      "International Trade Law", "en", "Interdisciplinary", "International", 2022,
      negative_question = None, international = Some(true)),
    Question("q6", "Le droit des obligations...", "Public Law",
      "en", "Public", "Swiss", 2020,
      negative_question = Some(true), international = Some(false)))

  val variants: Seq[Variant] = Seq(
    // q1: full config spread (multi-config question)
    Variant(1, "q1", "mcq_4_choices", "dev",
      choices = Some(Seq("Mutual promise", "A gift", "A tort", "A crime")),
      gold = Some(0)),
    Variant(2, "q1", "mcq_8_choices", "test",
      choices = Some((1 to 8).map(i => s"Option $i")), gold = Some(3)),
    Variant(3, "q1", "open_question", "dev",
      answer = Some("Consideration is the bargained-for exchange of value.")),
    // q2: single config
    Variant(4, "q2", "mcq_4_choices", "test",
      choices = Some(Seq("Diebstahl", "Betrug", "Raub", "Nichts")), gold = Some(1)),
    // q3: open only, dev+test splits
    Variant(5, "q3", "open_question", "dev",
      answer = Some("Powers are divided among branches. " + ("word " * 45))), // 50 words
    Variant(6, "q3", "open_question", "test",
      answer = Some("Separation prevents concentration of authority.")),
    // q4: mcq_16 + open
    Variant(7, "q4", "mcq_16_choices", "dev",
      choices = Some((1 to 16).map(i => s"Wahl $i")), gold = Some(15)),
    Variant(8, "q4", "open_question", "test",
      answer = Some("Eine juristische Person ist ein Rechtssubjekt.")),
    // q5: mcq_32 only
    Variant(9, "q5", "mcq_32_choices", "test",
      choices = Some((1 to 32).map(i => s"Treaty $i")), gold = Some(7)),
    // q6: open with the search-target answer
    Variant(10, "q6", "open_question", "dev",
      answer = Some("Les obligations naissent du contrat. CISG applies here.")))

  def writeTo(store: graft.lexam.pipeline.LexamStore): Unit = {
    store.writeQuestions(questions)
    store.writeVariants(variants)
  }
}
