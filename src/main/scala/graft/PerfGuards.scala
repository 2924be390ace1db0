package graft

/** Executable PERF.md guard rails (VERDICT r14 #3): a documented
  * scale blowup must not silently become a dependency of new catalog
  * entries. Library functions whose cost class is a MEASURED killer at
  * skew (the round-14 ladder's st04: the all-pairs attribution join is
  * output-quadratic in a key's event density, exponent 1.42 in one
  * decade) call [[record]] at plan-construction time; PlanLintSpec
  * builds every catalog entry inside [[withEntry]] and asserts each
  * guarded function's user set equals its explicit allowlist — the
  * BNLJ-allowlist pattern, applied to algorithmic shape instead of
  * join strategy. The registry is plan-time only (a ThreadLocal tag,
  * no execution cost) and empty outside the lint.
  */
object PerfGuards {
  /** Guard key for [[graft.streaming.StreamingOps.attributionJoin]] —
    * the exact all-pairs (click, purchase) window join. Correct where
    * key density is bounded; st28's last-click register is the
    * production configuration (PERF.md round 14). */
  val AllPairsAttribution = "all_pairs_attribution"

  private val ctx = new ThreadLocal[String]
  private val uses =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Tag every guarded call made while constructing `f` with `entry`. */
  def withEntry[T](entry: String)(f: => T): T = {
    ctx.set(entry)
    try f finally ctx.remove()
  }

  /** Called by guarded library functions at plan-construction time. */
  def record(guard: String): Unit = {
    val e = ctx.get
    if (e != null) { uses.add((guard, e)); () }
  }

  /** Catalog entries that invoked `guard` inside [[withEntry]]. */
  def usersOf(guard: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    uses.asScala.collect { case (g, e) if g == guard => e }.toSet
  }
}
