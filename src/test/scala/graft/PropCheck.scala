package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal ScalaCheck→ScalaTest bridge (the scalatestplus artifact is
  * not in the offline cache): run a property and fail the surrounding
  * test with ScalaCheck's own report (including the shrunk
  * counterexample) if it doesn't pass. */
object PropCheck {
  def check(prop: Prop, minSuccessful: Int = 100): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)) // deterministic CI runs
    val res = SCTest.check(params, prop)
    assert(res.passed, org.scalacheck.util.Pretty.pretty(res))
  }
}
