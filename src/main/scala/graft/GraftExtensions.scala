package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{ArrayCosine, ArrayDot}

/** The library's SparkSessionExtensions: registers the native
  * expressions at session build time, so a user enables everything with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) and `graft_array_dot` /
  * `graft_array_cosine` resolve in SQL text and `call_function` alike —
  * no per-session imperative registration. The imperative
  * `ArrayDot.register` / `ArrayCosine.register` paths remain for
  * sessions built without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage, "", "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_array_dot"),
      info("graft_array_dot",
        "graft_array_dot(a, b) - fused dot product of two array<double>"),
      (exprs: Seq[Expression]) => ArrayDot(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_array_cosine"),
      info("graft_array_cosine",
        "graft_array_cosine(a, b) - fused cosine similarity of two array<double>"),
      (exprs: Seq[Expression]) => ArrayCosine(exprs.head, exprs(1))))
    // whole-operator extension: per-key top-k as partial/final bounded
    // heaps (plans/TopKPerKey.scala); the imperative
    // spark.experimental.extraStrategies path remains for sessions
    // built without extensions (TopK.perKey registers it on first use).
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
