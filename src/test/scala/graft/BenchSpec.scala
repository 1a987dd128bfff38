package graft

import org.scalatest.funsuite.AnyFunSuite

/** Threshold arithmetic for the bench artifact's load-quality flag —
  * pure function, no Spark session needed. */
class BenchSpec extends AnyFunSuite {

  /** The committed `bench_out.json` blob (`git show HEAD:…`), falling
    * back to the working-tree file when not in a git checkout. The
    * working-tree copy is routinely a fresher uncommitted capture (the
    * driver's end-of-round run) and is NOT the anchor. */
  private def committedArtifact(): String = {
    val fromGit = try {
      val p = new ProcessBuilder("git", "show", "HEAD:bench_out.json")
        .redirectErrorStream(false).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream, "UTF-8")
        .getLines().mkString
      if (p.waitFor() == 0 && out.nonEmpty) Some(out) else None
    } catch { case scala.util.control.NonFatal(_) => None }
    fromGit.getOrElse {
      val src = scala.io.Source.fromFile("bench_out.json", "UTF-8")
      try src.getLines().mkString finally src.close()
    }
  }

  private val quiet = Seq.fill(10)((1.0, 1.2))

  test("quiet run: tight spreads at the anchor calib are not noisy") {
    assert(!Bench.isNoisy(quiet, Bench.CalibAnchor))
  }

  test("spread rule: flags at NoisySpreadCount wide queries, not below") {
    val wide = (0.5, 0.5 * Bench.NoisySpreadRatio * 1.01)
    val below = quiet ++ Seq.fill(Bench.NoisySpreadCount - 1)(wide)
    val at = quiet ++ Seq.fill(Bench.NoisySpreadCount)(wide)
    assert(!Bench.isNoisy(below, Bench.CalibAnchor))
    assert(Bench.isNoisy(at, Bench.CalibAnchor))
  }

  test("spread ratio is strict: exactly 3x is not wide") {
    val exact = Seq.fill(Bench.NoisySpreadCount + 1)(
      (1.0, Bench.NoisySpreadRatio))
    assert(!Bench.isNoisy(exact, Bench.CalibAnchor))
  }

  test("calib rule: >25% deviation flags in BOTH directions") {
    val a = Bench.CalibAnchor
    assert(Bench.isNoisy(quiet, a * 1.26))
    assert(Bench.isNoisy(quiet, a * 0.74))
    assert(!Bench.isNoisy(quiet, a * 1.24))
    assert(!Bench.isNoisy(quiet, a * 0.76))
  }

  test("zero-lo spreads never divide: ignored by the wide count") {
    val zeros = Seq.fill(Bench.NoisySpreadCount + 1)((0.0, 1.0))
    assert(!Bench.isNoisy(zeros, Bench.CalibAnchor))
  }

  private val committed = (1 to 20).map(i => s"q$i" -> 0.5).toMap

  test("anchor rule: uniform slowdown past 15% of the committed total " +
      "flags; a matching or faster run does not") {
    assert(Bench.isNoisyVsCommitted(
      committed.view.mapValues(_ * 1.16).toMap, committed))
    assert(!Bench.isNoisyVsCommitted(
      committed.view.mapValues(_ * 1.14).toMap, committed))
    assert(!Bench.isNoisyVsCommitted(committed, committed))
    // only slowdowns flag — a faster run moves the anchor when committed
    assert(!Bench.isNoisyVsCommitted(
      committed.view.mapValues(_ * 0.5).toMap, committed))
  }

  test("anchor rule: NoisyAnchorQueryCount queries past 1.5x flag even " +
      "when the total stays inside 15%") {
    def spiked(n: Int) = committed.map { case (k, v) =>
      k -> (if (k.stripPrefix("q").toInt <= n) v * 1.6 else v * 0.9)
    }
    assert(Bench.isNoisyVsCommitted(spiked(Bench.NoisyAnchorQueryCount),
      committed))
    assert(!Bench.isNoisyVsCommitted(
      spiked(Bench.NoisyAnchorQueryCount - 1), committed))
  }

  test("anchor rule: only COMMON positive queries compare; failed (-1) " +
      "and new queries are ignored") {
    val cur = committed ++ Map("brand_new" -> 99.0, "q1" -> -1.0)
    assert(!Bench.isNoisyVsCommitted(cur, committed))
    assert(!Bench.isNoisyVsCommitted(Map("other" -> 1.0), committed))
    assert(!Bench.isNoisyVsCommitted(Map.empty, committed))
  }

  test("anchor rule: a single query past 2.5x flags on its own; a " +
      "2.4x lone spike does not") {
    assert(Bench.isNoisyVsCommitted(
      committed + ("q1" -> 0.5 * 2.6), committed))
    assert(!Bench.isNoisyVsCommitted(
      committed + ("q1" -> 0.5 * 2.4), committed))
  }

  test("regression fixture: round 10's contaminated final capture " +
      "(4 queries >1.5x incl. dedup_semantic at 4.6x, total only +4.5%) " +
      "now triggers the flag; the clean judge rerun stays quiet") {
    // the actual r10 medians the old (count>=5, total>15%) thresholds
    // missed: exactly FOUR inflated queries, one a 4.6x phantom
    val committed10 = Map(
      "dedup_semantic" -> 0.43, "dedup_semantic_recall" -> 1.22,
      "dedup_minhash_recall" -> 0.78, "ev_gap_filled_hourly" -> 0.32) ++
      (1 to 150).map(i => s"q$i" -> 0.47).toMap
    val contaminated10 = committed10 ++ Map(
      "dedup_semantic" -> 2.00, "dedup_semantic_recall" -> 1.95,
      "dedup_minhash_recall" -> 1.25, "ev_gap_filled_hourly" -> 0.63)
    // shape sanity: the fixture reproduces the miss conditions
    val inflTot = contaminated10.values.sum / committed10.values.sum
    assert(inflTot < 1 + Bench.NoisyAnchorTotalDev)
    assert(contaminated10.count { case (k, v) =>
      v > Bench.NoisyAnchorQueryRatio * committed10(k) } == 4)
    assert(Bench.isNoisyVsCommitted(contaminated10, committed10))
    // the judge's idle rerun (uniform ~0.96x of committed) is clean
    assert(!Bench.isNoisyVsCommitted(
      committed10.view.mapValues(_ * 0.96).toMap, committed10))
  }

  test("artifact parser round-trips the bench line shape; truncation " +
      "and noisy anchors are inert") {
    val line = """{"metric":"total","value":1.5,"unit":"sec","reps":3,""" +
      """"calib":0.6,"noisy":false,"data_fp":"ab12","failed":[],""" +
      """"spread":{"a":[0.1,0.2],"b":[0.4,0.5]},""" +
      """"queries":{"a":0.15,"b":0.45}}"""
    assert(Bench.parseArtifact(line) ==
      Some((false, Some("ab12"), Map("a" -> 0.15, "b" -> 0.45))))
    assert(Bench.parseArtifact(line.replace("\"noisy\":false",
      "\"noisy\":true")).exists(_._1))
    // pre-fingerprint artifacts parse with data_fp = None (and the
    // anchor rule then does not fire — cross-data medians are
    // incomparable)
    assert(Bench.parseArtifact(line.replace(""""data_fp":"ab12",""", ""))
      == Some((false, None, Map("a" -> 0.15, "b" -> 0.45))))
    // a truncated capture (the driver keeps a bounded tail) parses to
    // None rather than to a wrong-but-plausible map
    assert(Bench.parseArtifact(line.dropRight(10)).isEmpty)
    assert(Bench.parseArtifact("{}").isEmpty)
  }

  test("noisy captures route AWAY from the clean anchor path: clean " +
      "writes land at outPath, noisy ones at the _noisy sibling") {
    // the r16-r18 clobber: the driver's round-close noisy capture must
    // never be able to replace a committed clean bench_out.json
    assert(Bench.routedOutPath("bench_out.json", noisy = false)
      == "bench_out.json")
    assert(Bench.routedOutPath("bench_out.json", noisy = true)
      == "bench_out_noisy.json")
    // directory components survive; non-.json overrides get a suffix
    assert(Bench.routedOutPath("/tmp/x/bench_out.json", noisy = true)
      == "/tmp/x/bench_out_noisy.json")
    assert(Bench.routedOutPath("capture", noisy = true) == "capture_noisy")
  }

  test("CalibAnchor tracks the committed clean artifact: within 10% " +
      "of HEAD bench_out.json's calib, or the constant has silently " +
      "drifted and must be retuned with the anchor commit") {
    val line = committedArtifact()
    val noisy = Bench.parseArtifact(line).exists(_._1)
    // a noisy committed anchor is not a calib reference (same inertness
    // rule as the r9 fixture below) — restore a clean anchor first
    assume(!noisy, "committed anchor is flagged noisy — fixture inert")
    val calib = """"calib":([0-9.]+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toDouble)
    assert(calib.nonEmpty, "committed artifact must carry a calib")
    val c = calib.get
    assert(math.abs(Bench.CalibAnchor - c) / c <= 0.10,
      s"CalibAnchor ${Bench.CalibAnchor} drifted >10% from the " +
        s"committed clean anchor's calib $c — retune the constant " +
        "together with the anchor commit (Bench.scala doc)")
  }

  test("regression fixture: round 9's contaminated final capture " +
      "(95.5s vs 74.9s committed, tight spreads, calib near anchor) " +
      "now triggers the flag via the anchor rule") {
    // Resolve the anchor the same way a round-over-round comparison
    // does: the COMMITTED blob, not whatever capture last overwrote the
    // working-tree file (the driver's end-of-round bench leaves an
    // uncommitted — often correctly noisy — artifact sitting there,
    // which is not the anchor and must not fail the suite). Outside a
    // git checkout, fall back to the file.
    val line = committedArtifact()
    val parsed = Bench.parseArtifact(line)
    assert(parsed.nonEmpty, "committed bench_out.json must parse")
    val Some((anchorNoisy, _, anchor)) = parsed
    // A noisy committed anchor is INERT at runtime (Bench.main skips the
    // anchor rule on it); mirror that here by cancelling the fixture
    // rather than failing — the contamination arithmetic below needs a
    // comparable anchor to mean anything.
    assume(!anchorNoisy, "committed anchor is flagged noisy — fixture inert")
    assert(anchor.size > 100)
    val contaminated = anchor.view.mapValues(_ * (95.5 / 74.9)).toMap
    assert(Bench.isNoisyVsCommitted(contaminated, anchor))
    // while the clean judge-rerun deltas (within 2%) stay quiet
    assert(!Bench.isNoisyVsCommitted(
      anchor.view.mapValues(_ * 1.02).toMap, anchor))
  }
}
