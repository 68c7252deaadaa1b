package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct}

/** SparkSessionExtensions entry point: makes the custom expressions
  * available to any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (the same injection
  * mechanism the reference uses for Iceberg,
  * reference: terraform/glue.tf:130). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectTableFunction((
      FunctionIdentifier("graft_version"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_version"),
      pipeline.VersionedTable.tvfBuilder))
  }
}
