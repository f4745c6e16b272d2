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

  // ---- floor provenance + the re-seed guard (VERDICT r10 #4) ----------

  test("mergeFloors stamps new seeds and improvements, inherits the rest") {
    val (q, prov, refused) = Bench.mergeFloors(
      floorQ0 = Map("q_old" -> 2.0, "q_beat" -> 3.0),
      prov0 = Map("q_old" -> "full-run@h@2026-01-01",
        "q_beat" -> "full-run@h@2026-01-01"),
      okResults = Map("q_old" -> 2.5, "q_beat" -> 1.5, "q_new" -> 4.0),
      gateNames = Set("q_old", "q_beat", "q_new"),
      stamp = "full-run@h@2026-08-16")
    assert(refused.isEmpty)
    assert(q == Map("q_old" -> 2.0, "q_beat" -> 1.5, "q_new" -> 4.0))
    assert(prov("q_old") == "full-run@h@2026-01-01")   // inherited
    assert(prov("q_beat") == "full-run@h@2026-08-16")  // improved
    assert(prov("q_new") == "full-run@h@2026-08-16")   // fresh seed
  }

  test("mergeFloors refuses a full-run re-seed of a half-deleted entry") {
    // value deleted, provenance left behind: the r10 doc_simhash pattern
    val (q, prov, refused) = Bench.mergeFloors(
      floorQ0 = Map.empty,
      prov0 = Map("q_simhash" -> "full-run@h@2026-01-01"),
      okResults = Map("q_simhash" -> 1.65),
      gateNames = Set("q_simhash"),
      stamp = "full-run@h@2026-08-16")
    assert(refused == Set("q_simhash"))
    assert(!q.contains("q_simhash"), "refused seed must stay valueless")
    // the old line survives so the guard stays armed next run
    assert(prov("q_simhash") == "full-run@h@2026-01-01")
  }

  test("mergeFloors confirm-stamps an unstamped legacy floor this run " +
      "reproduced within 2x, and leaves unapproachable ones unstamped") {
    val (q, prov, _) = Bench.mergeFloors(
      floorQ0 = Map("q_near" -> 1.0, "q_far" -> 1.0,
        "q_stamped" -> 1.0),
      prov0 = Map("q_stamped" -> "full-run@h@2026-01-01"),
      okResults = Map("q_near" -> 1.8, "q_far" -> 5.0,
        "q_stamped" -> 1.8),
      gateNames = Set("q_near", "q_far", "q_stamped"),
      stamp = "full-run@h@2026-08-16",
      confirmStamp = "full-run-confirmed@h@2026-08-16")
    assert(q == Map("q_near" -> 1.0, "q_far" -> 1.0, "q_stamped" -> 1.0))
    assert(prov("q_near") == "full-run-confirmed@h@2026-08-16")
    assert(!prov.contains("q_far"), "an unreproduced floor must stay " +
      "unstamped — the signal to re-seed or retire it")
    // an existing line is never overwritten by a confirmation
    assert(prov("q_stamped") == "full-run@h@2026-01-01")
  }

  test("mergeFloors seeds a truly fresh gate (no value, no provenance)") {
    val (q, _, refused) = Bench.mergeFloors(
      Map.empty, Map.empty, Map("q_new" -> 1.0), Set("q_new"), "s@h@d")
    assert(refused.isEmpty && q == Map("q_new" -> 1.0))
  }

  test("mergeFloors keeps the orphan provenance of a gate absent from " +
      "this run (errored gate must not disarm the re-seed guard)") {
    // value deleted, provenance left, and the gate ERRORED this run (not
    // in okResults): the line must survive the merge, or the NEXT full
    // run would seed the floor freshly with the guard silently gone
    val (q, prov, refused) = Bench.mergeFloors(
      floorQ0 = Map("q_live" -> 1.0),
      prov0 = Map("q_guarded" -> "full-run@h@2026-01-01"),
      okResults = Map("q_live" -> 1.2),
      gateNames = Set("q_live", "q_guarded"),
      stamp = "full-run@h@2026-08-16")
    assert(refused == Set("q_guarded"))
    assert(!q.contains("q_guarded"))
    assert(prov("q_guarded") == "full-run@h@2026-01-01")
    // ...while a DELETED gate's orphan line is pruned with the gate
    val (_, prov2, refused2) = Bench.mergeFloors(
      Map.empty, Map("q_gone" -> "full-run@h@2026-01-01"),
      Map.empty, Set("q_other"), "s@h@d")
    assert(refused2.isEmpty && !prov2.contains("q_gone"))
  }

  test("loadFloor parses values with signed exponents (9.5E-4 style)") {
    // Double.toString of a sub-1e-3 floor serializes with a negative
    // exponent; a regex that can't match it blanks the entire ledger
    val tmp = java.nio.file.Files.createTempFile("graft_floor_exp", ".json")
    try {
      Bench.writeFloor("/sf/x",
        queries = Map("q_tiny" -> 9.5e-4, "q_big" -> 1.3e7),
        rates = Map.empty, plans = Map.empty, prov = Map.empty, path = tmp)
      val (q, _, _, _, ok) = Bench.loadFloor("/sf/x", tmp)
      assert(ok, "a tiny floor must not freeze the ledger")
      assert(q == Map("q_tiny" -> 9.5e-4, "q_big" -> 1.3e7))
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("writeFloor/loadFloor round-trips all four sections") {
    val tmp = java.nio.file.Files.createTempFile("graft_floor", ".json")
    try {
      Bench.writeFloor("/sf/x",
        queries = Map("q1" -> 1.25, "q2" -> 0.5),
        rates = Map("write" -> 2.7e7),
        plans = Map("q1" -> 4.0),
        prov = Map("q1" -> "subset-converged@h@2026-08-16"),
        path = tmp)
      val (q, r, p, prov, ok) = Bench.loadFloor("/sf/x", tmp)
      assert(ok)
      assert(q == Map("q1" -> 1.25, "q2" -> 0.5))
      assert(r == Map("write" -> 2.7e7))
      assert(p == Map("q1" -> 4.0))
      assert(prov == Map("q1" -> "subset-converged@h@2026-08-16"))
      // sf binding: a dev run at another sf reads empty and must not write
      val (q2, _, _, _, ok2) = Bench.loadFloor("/sf/other", tmp)
      assert(q2.isEmpty && !ok2)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
