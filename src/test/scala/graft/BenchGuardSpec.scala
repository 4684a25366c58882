package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention guard's parsing chain — the exact failure modes that
  * shipped in round 7 (spaced-JSON reference parsed to zero bands, so
  * the guard ran silently disabled) must be loud forever. */
class BenchGuardSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.1"

  test("parses the compact (no-whitespace) recording format") {
    val txt =
      """{"metric":"total","value":10.0,"unit":"sec","queries":{"q01":1.25,"d10":0.72},"sf":0.1}"""
    val bands = Bench.parseReference(txt, sfDir)
    assert(bands == Map("q01" -> 1.25, "d10" -> 0.72))
  }

  test("parses the spaced format that disabled the round-7 guard") {
    val txt =
      """{"metric": "total", "value": 229.63, "unit": "sec", "sf": 0.1, "queries": {"q101": 1.99, "t33": 3.61, "d10": 0.72}}"""
    val bands = Bench.parseReference(txt, sfDir)
    assert(bands == Map("q101" -> 1.99, "t33" -> 3.61, "d10" -> 0.72))
  }

  test("sf mismatch yields no bands (bands from another scale are noise)") {
    val txt = """{"value": 10.0, "queries": {"q01": 1.0}, "sf": 0.01}"""
    assert(Bench.parseReference(txt, sfDir).isEmpty)
  }

  test("Bench's truncated summary line is rejected as a reference") {
    // the LAST stdout line is format-identical to a recording but
    // holds only the top-12 queries; its "queries_file" marker must
    // hard-error rather than arm a 12-band guard over a 220-query
    // suite
    val txt =
      """{"metric":"total","value":289.2,"unit":"sec","failed":[],"contended":[],"queries":{"p9":28.0},"queries_file":"bench_last.json","sf":0.1}"""
    assertThrows[RuntimeException](Bench.parseReference(txt, sfDir))
  }

  test("sf match + zero parsable bands is a HARD error, not silence") {
    // sf matches but the per-query entries use a shape the parser
    // cannot read — the guard must refuse to run disabled
    val txt = """{"sf": 0.1, "queries": {"q-01": [1.0]}}"""
    assertThrows[RuntimeException](Bench.parseReference(txt, sfDir))
  }

  test("band limit flags a slow query and passes a normal one") {
    // guard arms: a query at 3.1x its band (and > band+1s) is flagged
    val limit = Bench.bandLimit(2.0)
    assert(limit == 6.0)
    assert(2.4 < limit, "normal jitter stays inside the band")
    assert(6.2 > limit, "a 3.1x run must be flagged")
    // small bands are dominated by the +1s absolute floor so
    // sub-second queries aren't flagged on scheduler noise
    assert(Bench.bandLimit(0.1) == 1.1)
  }

  test("heavy bands (> 5 s) use the tighter 2x limit") {
    // the documented contention event inflated the suite uniformly
    // 2.8x; under the old uniform max(3x, +1s) limit every heavy
    // query passed unflagged. The tier catches exactly that event...
    assert(Bench.bandLimit(8.0) == 16.0)
    assert(8.0 * 2.8 > Bench.bandLimit(8.0),
      "a uniform 2.8x contention event must be flagged on heavy queries")
    // ...while in-suite repeatability (~±30% measured on > 5 s
    // queries) stays inside
    assert(8.0 * 1.3 < Bench.bandLimit(8.0))
    // boundary: a 5 s band is still the loose tier — the 2-5 s
    // entries (BM25 serve twins, two-Lloyd ANN) measured up to ~2.1x
    // spread between isolated and in-suite contexts with zero
    // contention, so 2x would false-flag there (t42 did, round 9)
    assert(Bench.bandLimit(5.0) == 15.0)
    assert(math.abs(Bench.bandLimit(2.65) - 7.95) < 1e-9)
    assert(2.65 * 2.05 < Bench.bandLimit(2.65),
      "the observed clean 2.05x spread on t42 must not flag")
    assert(Bench.bandLimit(5.01) < 15.0)
  }

  test("the committed bench_reference.json parses to a non-empty band set") {
    val p = java.nio.file.Paths.get("bench_reference.json")
    assume(java.nio.file.Files.exists(p))
    val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val bands = Bench.parseReference(txt, sfDir)
    assert(bands.size > 100,
      s"expected a full-suite recording, got ${bands.size} bands")
    assert(bands.values.forall(v => v > 0 && v < 300))
  }
}
