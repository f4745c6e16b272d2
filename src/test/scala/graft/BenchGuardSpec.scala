package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's plan-regression guard (VERDICT r6 #8): exchange counts of
  * unchanged plans are deterministic, so exceeding the ledger floor is a
  * genuine shuffle regression — the one bench signal that can hard-fail
  * on this contention-prone host. Pure-function spec: triggered, then
  * "fixed" (count back at floor), then the deliberate-change override
  * (entry deleted from the ledger re-seeds silently). */
class BenchGuardSpec extends AnyFunSuite {

  test("fires when an audited query gains an exchange") {
    val floor = Map("q_join" -> 2.0, "q_agg" -> 1.0)
    val regs = Bench.planRegressions(floor,
      Map("q_join" -> 3, "q_agg" -> 1))
    assert(regs == Seq("q_join: exchanges 3 > floor 2"))
  }

  test("silent when counts are at or below floor (the fixed state)") {
    val floor = Map("q_join" -> 2.0, "q_agg" -> 1.0)
    assert(Bench.planRegressions(floor,
      Map("q_join" -> 2, "q_agg" -> 0)).isEmpty)
  }

  test("a query absent from the ledger re-seeds without firing " +
      "(the documented deliberate-plan-change override)") {
    assert(Bench.planRegressions(Map.empty, Map("q_new" -> 7)).isEmpty)
  }

  test("multiple regressions report sorted by query name") {
    val regs = Bench.planRegressions(
      Map("b" -> 1.0, "a" -> 1.0, "c" -> 5.0),
      Map("b" -> 2, "a" -> 3, "c" -> 5))
    assert(regs == Seq("a: exchanges 3 > floor 1",
      "b: exchanges 2 > floor 1"))
  }
}
