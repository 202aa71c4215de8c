package graft.operators

/** The ONE wall-clock helper for the measurement mains (IvfTrainBench,
  * RankingBench, SpanDedupBench, PipelineScaleBench). Each main used to
  * carry its own byte-identical lambda; any change to the timing
  * discipline (post-action barrier, clock source) now lands in one
  * place instead of silently drifting across benches. The thunk must
  * contain its own action (count/collect) — this measures submission
  * through completion of whatever `f` forces. */
private[operators] object BenchTime {
  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }
}
