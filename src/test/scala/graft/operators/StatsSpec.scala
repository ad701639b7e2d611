package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the exact-integer correlation/trend programs on hand-computed
  * inputs (the oracle gate covers q189/q190 end-to-end; these verify the
  * programs are the INTENDED ones, sign conventions included).
  */
class StatsSpec extends SparkSpec {

  private def xy(rows: (String, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "i", "x", "y")
  }

  test("hbosRarity: rarity is the product of per-feature bin occupancies") {
    import spark.implicits._
    // f1 in [0, 9], 2 buckets: bin = (v*2) div 10 -> 0,0,0,1
    // f2 in [0, 1], 2 buckets: bin = (v*2) div 2  -> 0,1,1,1
    val d = Seq((1L, 0L, 0L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 9L, 1L))
      .toDF("id", "f1", "f2")
    val got = Stats.hbosRarity(d, Seq("f1", "f2"), buckets = 2)
      .select(col("id"), col("rarity").cast("long"))
      .as[(Long, Long)].collect().toMap
    // occ f1: bin0=3, bin1=1; occ f2: bin0=1, bin1=3
    assert(got === Map(1L -> 3L, 2L -> 9L, 3L -> 9L, 4L -> 3L))
  }

  test("hbosRarity: NULL features drop the row; constant feature is one bin") {
    import spark.implicits._
    val d = Seq((1L, Some(5L), 7L), (2L, None, 7L), (3L, Some(5L), 7L))
      .toDF("id", "f1", "f2")
    val got = Stats.hbosRarity(d, Seq("f1", "f2"), buckets = 4)
      .select(col("id"), col("rarity").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 4L, 3L -> 4L), "2 rows x 2 features -> 2*2")
  }

  test("spearmanByGroup: perfect monotone 10000, perfect reverse -10000") {
    val d = xy(
      ("up", 1L, 10L, 100L), ("up", 2L, 20L, 200L), ("up", 3L, 30L, 300L),
      ("dn", 1L, 10L, 300L), ("dn", 2L, 20L, 200L), ("dn", 3L, 30L, 100L))
    val got = Stats.spearmanByGroup(d, col("g"), col("i"), col("x"),
      col("y")).collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("up" -> 10000L, "dn" -> -10000L))
  }

  test("spearmanByGroup: one transposition, hand value") {
    // ranks x = 1,2,3,4; ranks y = 2,1,3,4 -> sd2 = 1+1 = 2
    // rho_bp = 10000 - 120000 div (4*15) = 10000 - 2000 = 8000
    val d = xy(("g", 1L, 1L, 20L), ("g", 2L, 2L, 10L),
      ("g", 3L, 3L, 30L), ("g", 4L, 4L, 40L))
    val got = Stats.spearmanByGroup(d, col("g"), col("i"), col("x"),
      col("y")).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3))
      === ((4L, 2L, 8000L)))
  }

  test("spearmanByGroup: value ties break by id deterministically") {
    // x ties everywhere -> rank x follows id order; y strictly follows
    // id too -> d = 0, rho = 10000 regardless of the tied values
    val d = xy(("g", 1L, 5L, 10L), ("g", 2L, 5L, 20L), ("g", 3L, 5L, 30L))
    val got = Stats.spearmanByGroup(d, col("g"), col("i"), col("x"),
      col("y")).collect().head
    assert(got.getLong(3) === 10000L)
  }

  private def gxy(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("g", "x", "y")
  }

  test("trendSlopeByGroup: exact positive and negative slopes, sign-safe") {
    // up: y = 5x + 1 on x=0..3 -> slope exactly 5 -> 50000 bp
    // dn: y = -3x + 9        -> slope exactly -3 -> -30000 bp
    val d = gxy(
      ("up", 0L, 1L), ("up", 1L, 6L), ("up", 2L, 11L), ("up", 3L, 16L),
      ("dn", 0L, 9L), ("dn", 1L, 6L), ("dn", 2L, 3L), ("dn", 3L, 0L))
    val got = Stats.trendSlopeByGroup(d, col("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // n=4, sx=6, sx2=14 -> den = 4*14-36 = 20
    assert(got("up") === ((100L, 20L, 50000L)))
    assert(got("dn") === ((-60L, 20L, -30000L)))
  }

  test("trendSlopeByGroup: truncation goes toward zero for negatives") {
    // y = (1, 0) on x = (0, 3): num = 2*(0*1+3*0) - 3*1 = -3, den = 2*9-9 = 9
    // slope = -1/3 -> -(30000 div 9) = -3333 (NOT floor's -3334)
    val d = gxy(("g", 0L, 1L), ("g", 3L, 0L))
    val got = Stats.trendSlopeByGroup(d, col("g"), col("x"), col("y"))
      .collect().head
    assert((got.getLong(2), got.getLong(3), got.getLong(4))
      === ((-3L, 9L, -3333L)))
  }

  test("jackknifeVarByGroup: hand algebra on n=2 and a constant group") {
    import spark.implicits._
    // {1,3}: S=4, d=(2,-2) -> num=8, den=2^3*1=8, var=1 -> 10000 bp
    // {5,5,5}: num=0 -> var 0; singleton group drops
    val d = Seq(("a", 1L), ("a", 3L), ("c", 5L), ("c", 5L), ("c", 5L),
      ("solo", 7L)).toDF("g", "x")
    val got = Stats.jackknifeVarByGroup(d, col("g"), col("x"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === Map(
      "a" -> ((2L, 8L, 8L, 10000L)),
      "c" -> ((3L, 0L, 54L, 0L))))
  }

  test("trendSlopeByGroup: single distinct x reports NULL slope, exact parts") {
    val d = gxy(("g", 2L, 1L), ("g", 2L, 5L))
    val got = Stats.trendSlopeByGroup(d, col("g"), col("x"), col("y"))
      .collect().head
    assert(got.getLong(3) === 0L, "den = 0")
    assert(got.isNullAt(4), "slope undefined on a vertical line")
  }

  private def ks(rows: (Long, Int, Int)*) = {
    import spark.implicits._
    val d = rows.toDF("v", "a", "b")
    Stats.ksTwoSample(d, col("v"), col("a"), col("b"),
      v => (v / lit(2)).cast("long")) // 2-wide buckets: multi-bucket path
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head
  }

  test("ksTwoSample: disjoint supports give D = 1 (10000 bp)") {
    val got = ks((1L, 1, 0), (2L, 1, 0), (3L, 1, 0),
      (4L, 0, 1), (5L, 0, 1), (6L, 0, 1))
    assert(got === ((3L, 3L, 9L, 10000L)))
  }

  test("ksTwoSample: identical samples give D = 0") {
    val got = ks((1L, 1, 0), (1L, 0, 1), (2L, 1, 0), (2L, 0, 1))
    assert(got === ((2L, 2L, 0L, 0L)))
  }

  test("ksTwoSample: hand case across a bucket boundary") {
    // A={1,3}, B={2,3}: cum pairs (1,0),(1,1),(2,2) x n=2 each side
    // -> |c1*n2 - c2*n1| = 2, 0, 0 -> d_num=2 over n1*n2=4 -> 5000 bp.
    // Values 1,2 fall in bucket 0, value 3 in bucket 1 — the offset
    // join, not a single window, produces the cumulative.
    val got = ks((1L, 1, 0), (2L, 0, 1), (3L, 1, 0), (3L, 0, 1))
    assert(got === ((2L, 2L, 2L, 5000L)))
  }

  test("ksTwoSample: EDF evaluated after ALL rows of a tied value") {
    // A={5}, B={5}: the only value is shared; evaluating mid-tie would
    // see |1*1 - 0*1| = 1, after the tie it is 0 — the contract is 0.
    val got = ks((5L, 1, 0), (5L, 0, 1))
    assert(got === ((1L, 1L, 0L, 0L)))
  }

  test("chiSquareBp: hand-computed 2x2 association") {
    import spark.implicits._
    // cells: (a1,b1)=10 (a1,b2)=20 (a2,b1)=20 (a2,b2)=10
    // N=60, all margins 30, E=15 per cell; o·N − r·c = ±300 everywhere
    // cell_bp = 10⁴·300² div (60·30·30) = 90·10⁷ div 54000 = 16666
    // chi2_bp = 4·16666 = 66664 (textbook 4·25/15 = 6.6667 → 66667;
    // the gap is the per-cell truncation); dof = 4−2−2+1 = 1
    val rows =
      Seq.fill(10)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2")) ++
        Seq.fill(20)(("a2", "b1")) ++ Seq.fill(10)(("a2", "b2"))
    val got = Stats.chiSquareBp(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2))
      === ((66664L, 1L, 60L)))
  }

  test("mannWhitneyU2: doubled midranks handle the cross-group tie exactly") {
    import spark.implicits._
    // A = {1, 2}, B = {2, 3}: midranks 1, 2.5, 2.5, 4 ->
    // U_A = 0.5 (the tied pair contributes 1/2), U_B = 3.5;
    // in doubled units u2_a = 1, u2_b = 7, and u2_a + u2_b = 2·2·2.
    val d = Seq((1L, 1, 0), (2L, 1, 0), (2L, 0, 1), (3L, 0, 1))
      .toDF("v", "a", "b")
    val got = Stats.mannWhitneyU2(d, col("v"), col("a"), col("b"),
      x => (x / lit(10)).cast("long")).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) === ((2L, 2L, 1L, 7L)))
  }

  test("chiSquareBp: perfect independence is exactly zero") {
    import spark.implicits._
    // o = r·c/N for every cell → every numerator is exactly 0
    val rows =
      Seq.fill(6)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
        Seq.fill(3)(("y", "p")) ++ Seq.fill(1)(("y", "q"))
    val got = Stats.chiSquareBp(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(got.getLong(0) === 0L)
  }
}
