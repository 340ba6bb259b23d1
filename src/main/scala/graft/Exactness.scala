package graft

/** Machine-checkable exactness classes for the query registry.
  *
  * The sf1 correctness audit (PLANS.md, round 7) found one seam in the
  * float-rounding discipline: revenue sums whose magnitude grows with
  * the corpus (~6e10 at sf1) accumulate double summation-order ulps
  * that cross the 2dp rounding boundary the oracle hash-compare relies
  * on. Those queries are exact at the driver's GATE scale (sf0.01,
  * re-verified at sf0.1) but not at ARBITRARY scale; their registered
  * integer-cents twins (per-row cent quantization, Long sums — exact in
  * any order at any magnitude) are. Round 7 recorded that split as a
  * PLANS.md paragraph; this object makes it a TYPED, TESTED contract —
  * ExactnessSpec asserts every GateScale query names a registered
  * AnyScale twin, so the registry cannot silently grow a float seam
  * without either a twin or a loud test failure.
  *
  * Every query not listed in [[gateScaleTwins]] is AnyScale: either its
  * arithmetic is integer/count/date-typed end to end, its doubles are
  * magnitude-bounded by construction (means, ratios, log-probabilities,
  * rounded per-row BEFORE any unbounded aggregation), or its oracle
  * replays the identical IEEE sequence (documented per family in the
  * operator scaladocs). The sf1 audit is the empirical census backing
  * that default: every non-listed query it covered was hash-exact at
  * 10x gate scale on the fixed fixtures.
  */
object Exactness {

  sealed trait Class
  /** Hash-exact at any corpus scale: integer/ordinal arithmetic, or
    * float work whose rounding absorbs reordering noise at ALL
    * magnitudes the data model can produce. */
  case object AnyScale extends Class
  /** Hash-exact at the driver's gate scale (and re-verified at sf0.1),
    * but carrying an unbounded-magnitude float aggregate whose 2dp
    * rounding stops absorbing ulp noise as the corpus grows —
    * reference-faithful float semantics, kept deliberately. */
  case object GateScale extends Class

  /** GateScale float form → its registered AnyScale integer-cents twin.
    * Keys and values must both be registered queries; enforced by
    * ExactnessSpec against SparkEntry.queries. */
  val gateScaleTwins: Map[String, String] = Map(
    "q9_region_rollup" -> "q9_region_rollup_cents",
    "q9_region_rollup_csv" -> "q9_region_rollup_cents_csv",
    "q10_rollup_sets" -> "q10_rollup_cents",
    "q10_rollup_sets_csv" -> "q10_rollup_cents_csv",
    "q18_cube_revenue" -> "q18_cube_cents",
    "q18_cube_revenue_csv" -> "q18_cube_cents_csv")

  def of(name: String): Class =
    if (gateScaleTwins.contains(name)) GateScale else AnyScale
}
