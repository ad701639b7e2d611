package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native kernels hash raw UTF-8 bytes (UTF8String.getBytes); this
  * pins that multi-byte text — CJK, accents, emoji — produces results
  * identical to the composed Spark-expression forms, whose md5 also
  * runs over UTF-8. A divergence here would silently split the corpus
  * by script at 100 TB.
  */
class KernelUnicodeSpec extends SparkSpec {

  private val docs = Seq(
    1L -> "héllo wörld café naïve résumé straße über größe",
    2L -> "这是 一个 中文 文档 的 测试 例子 内容 覆盖",
    3L -> "мир труд май россия текст проверка юникода здесь",
    4L -> "🎉 emoji 🚀 mixed 日本語 and ascii words here too")

  private def df = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  test("word-gram kernel matches composed form on multi-byte text") {
    val ws = graft.functions.TextFunctions.words(col("text"))
    val composed = df.select(col("doc_id"),
      graft.functions.TextFunctions.wordGrams(ws, 3)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = df.select(col("doc_id"),
      WordGramsNative.gramsCol(ws, 3)).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === composed)
  }

  test("winnow kernel matches composed form on multi-byte text") {
    val composed = df.select(col("doc_id"),
      TextFunctions.winnowFingerprints(col("text"), 3, 4)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = df.select(col("doc_id"),
      Winnow.fingerprintsCol(col("text"), 3, 4)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === composed)
  }

  test("simhash and minhash kernels match aggregate forms on multi-byte text") {
    def m(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(m(graft.operators.Dedup.simhashFingerprints(
      df, col("doc_id"), col("text"))) ===
      m(graft.operators.Dedup.simhashFingerprintsAgg(
        df, col("doc_id"), col("text"))))
    val native = graft.operators.Dedup
      .gramSets(df, col("doc_id"), col("text"), 3)
      .select(col("doc_id"), MinHashNative.signatureCol(col("grams"), 16))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = graft.operators.Dedup
      .minhashSignaturesAgg(df, col("doc_id"), col("text"), 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === agg)
  }

  test("cdc chunk kernel matches composed form on multi-byte text") {
    // supplementary chars (emoji) are one UTF8String char and one code
    // point — the kernel's codePoints() indexing must line up with the
    // composed form's substr/ascii char indexing
    def pull(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // doc 4 (emoji) excluded from the comparison: supplementary-plane
    // code points overflow the composed form's ANSI Int column (it
    // throws); the exact-Long kernel strictly extends it there.
    val bmp = df.filter(col("doc_id") =!= 4L)
    val native = pull(graft.operators.Dedup.cdcChunks(
      bmp, col("doc_id"), col("text"), mask = 5, minLen = 1))
    val composed = pull(graft.operators.Dedup.cdcChunksComposed(
      bmp, col("doc_id"), col("text"), mask = 5, minLen = 1))
    assert(native === composed)
    // supplementary-plane doc: kernel stays defined, and with minLen=1
    // the chunks partition the doc exactly
    val emoji = pull(graft.operators.Dedup.cdcChunks(
      df.filter(col("doc_id") === 4L), col("doc_id"), col("text"),
      mask = 5, minLen = 1))
    assert(emoji(4L).mkString === docs.toMap.apply(4L))
  }

  test("kernel hash60 matches the DuckDB-replayable md5 formula for unicode") {
    // hash60("0#" + gram) must equal conv(substr(md5(...),1,15),16,10)
    // for a multi-byte gram — the exact formula the oracles inline.
    import spark.implicits._
    val gram = "中文 文档 测试"
    val viaExpr = Seq(gram).toDF("g")
      .select(TextFunctions.hash60(col("g"), 0)).head().getLong(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update("0#".getBytes("UTF-8")); md.update(gram.getBytes("UTF-8"))
    val d = md.digest()
    var v = 0L; var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    assert((v >>> 4) === viaExpr)
  }
}
