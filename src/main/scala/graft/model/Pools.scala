package graft.model

/** One bounded-pool map, shared by every overlap-independent-jobs
  * site (guide §2.6): the bench's untimed artifact passes, the
  * curation pipeline's accounting reads, the stage probe and the
  * determinism suite each hand-rolled the same submit-all-then-get
  * Executors plumbing with slightly different lifecycle handling
  * (round-14 review) — one implementation means one place for the
  * semantics: input order preserved in the result, the pool always
  * shut down, the first failure propagated after submission (tasks
  * already queued run to completion; nothing here is side-effecting
  * beyond Spark jobs, so that is waste-bounded, not correctness). */
object Pools {
  def mapConcurrent[A, B](xs: Seq[A], par: Int)(f: A => B): Seq[B] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(par, 1))
    try {
      val futs = xs.map { x =>
        pool.submit(new java.util.concurrent.Callable[B] {
          def call(): B = f(x)
        })
      }
      futs.map(_.get())
    } finally pool.shutdown()
  }
}
