package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-record clobber guard: a strictly worse rerun (higher steal AND
  * higher total, same gate set) must land in bench_candidate.json, never
  * overwrite bench_last.json — the r14 4x-only threshold let 2-3x-dirtier,
  * slower reruns clobber the canonical record twice in one round. */
class BenchGuardSpec extends AnyFunSuite {

  private val record =
    """{"metric":"total","value":88.59,"unit":"sec",""" +
      """"queries":{"q1":1.0,"q2":2.5},"queries_min":{"q1":0.9,"q2":2.1},""" +
      """"queries_spread":{"q1":0.1,"q2":0.2},"steal_jiffies":3890,""" +
      """"contended":true,"cal_start_sec":0.430,"cal_end_sec":0.431,""" +
      """"sf":"/root/testdata/sf0.1"}"""
  private val sf = "/root/testdata/sf0.1"
  private val gates = Set("q1", "q2")

  test("strictly worse rerun (higher steal AND total) -> candidate") {
    assert(Bench.recordTarget(Some(record), sf, total = 97.16,
      stealTotal = 4430, contended = true, gates) === "bench_candidate.json")
    // even a MILDLY dirtier+slower rerun is refused once past the 200-jiffy
    // noise floor — the r14 failure mode was exactly the 1.1-3x-dirtier
    // window the 4x threshold waved through
    assert(Bench.recordTarget(Some(record), sf, total = 89.0,
      stealTotal = 4200, contended = true, gates) === "bench_candidate.json")
  }

  test("better on either axis overwrites the record") {
    // lower total at higher steal: a real improvement measured in a dirtier
    // window still advances the record
    assert(Bench.recordTarget(Some(record), sf, total = 83.4,
      stealTotal = 4430, contended = true, gates) === "bench_last.json")
    // higher total at lower steal: an honest quieter-window measurement
    // (code may genuinely have gotten slower) also advances it
    assert(Bench.recordTarget(Some(record), sf, total = 92.0,
      stealTotal = 1500, contended = true, gates) === "bench_last.json")
    // higher total at NOISE-FLOOR-higher steal (within 200 jiffies): a
    // genuine regression measured in an equally-quiet window must advance
    // the record, not hide in a candidate file forever
    assert(Bench.recordTarget(Some(record), sf, total = 92.0,
      stealTotal = 3990, contended = true, gates) === "bench_last.json")
  }

  test("changed gate set always overwrites, even when slower and dirtier") {
    assert(Bench.recordTarget(Some(record), sf, total = 99.0,
      stealTotal = 5000, contended = true,
      gates + "q3_new_gate") === "bench_last.json")
    // ... including through the 4x-contended quarantine (the r15 ADVICE
    // combination: changed gates in a filthy window must still overwrite —
    // the record tracks the CURRENT gate set, full stop)
    assert(Bench.recordTarget(Some(record), sf, total = 99.0,
      stealTotal = 18233, contended = true,
      gates + "q3_new_gate") === "bench_last.json")
  }

  test("prevTotal anchors to the total line, not the first value key") {
    // a record whose FIRST "value": belongs to another metric must still
    // compare against the total — an unanchored regex would read 1.0 here
    // and wave a strictly-worse rerun through as an "improvement"
    val reordered =
      """{"metric":"warmup","value":1.0,"unit":"sec"}""" + "\n" +
        record
    assert(Bench.recordTarget(Some(reordered), sf, total = 97.16,
      stealTotal = 4430, contended = true, gates) === "bench_candidate.json")
  }

  test("sf mismatch -> smoke; 4x-dirtier contended window -> contended") {
    assert(Bench.recordTarget(Some(record), "/root/testdata/sf0.001",
      total = 5.0, stealTotal = 0, contended = false,
      gates) === "bench_smoke.json")
    // same gates, 4x+ dirtier but LOWER total: not strictly worse, yet the
    // contended rule still quarantines it (noise can deflate a timing too)
    assert(Bench.recordTarget(Some(record), sf, total = 80.0,
      stealTotal = 18233, contended = true, gates) === "bench_contended.json")
  }

  test("no standing record -> bench_last.json") {
    assert(Bench.recordTarget(None, sf, total = 88.0, stealTotal = 100,
      contended = false, gates) === "bench_last.json")
  }
}
