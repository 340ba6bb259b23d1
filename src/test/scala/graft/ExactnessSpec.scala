package graft

import org.scalatest.funsuite.AnyFunSuite

/** The exactness contract as a test (r7 verdict #5): the sf1 audit's
  * float-seam residue must stay a typed registry attribute, not prose. */
class ExactnessSpec extends AnyFunSuite {

  private val registered = SparkEntry.queries.keySet

  test("every GateScale query is registered and names a registered " +
       "AnyScale twin") {
    Exactness.gateScaleTwins.foreach { case (floatForm, twin) =>
      assert(registered.contains(floatForm),
        s"GateScale entry '$floatForm' names no registered query")
      assert(registered.contains(twin),
        s"'$floatForm' declares twin '$twin', which is not registered")
      assert(Exactness.of(twin) == Exactness.AnyScale,
        s"twin '$twin' must itself be AnyScale (a GateScale twin chain " +
        "would defer the contract instead of closing it)")
    }
  }

  test("the twin preserves the query family (same base, _cents " +
       "discipline, csv-ness carried over)") {
    Exactness.gateScaleTwins.foreach { case (floatForm, twin) =>
      assert(twin.contains("cents"),
        s"twin '$twin' does not carry the integer-cents discipline marker")
      assert(floatForm.endsWith("_csv") == twin.endsWith("_csv"),
        s"'$floatForm' and twin '$twin' disagree on the csv source twin")
      // same query number prefix (q9/q10/q18 families)
      val base = floatForm.takeWhile(_ != '_')
      assert(twin.startsWith(base),
        s"twin '$twin' is not from '$floatForm''s family")
    }
  }

  test("every query has a class and the default census holds: only the " +
       "declared float seams are GateScale") {
    val gate = registered.filter(n => Exactness.of(n) == Exactness.GateScale)
    assert(gate == Exactness.gateScaleTwins.keySet,
      "GateScale classification drifted from the declared map")
    // the known float-revenue shapes must be declared: a refactor that
    // renames q9/q10/q18 without updating the contract fails here
    assert(gate.exists(_.startsWith("q9")) && gate.exists(_.startsWith("q10")) &&
           gate.exists(_.startsWith("q18")))
  }
}
