package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct, RollingXxHash64, WordShingles}

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
    e.injectFunction((
      FunctionIdentifier("graft_rolling_xxhash64"),
      new ExpressionInfo(classOf[RollingXxHash64].getName,
        "graft_rolling_xxhash64"),
      (exprs: Seq[Expression]) => RollingXxHash64(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (exprs: Seq[Expression]) => {
        val n = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_shingles n must be an int literal, got $other")
        }
        WordShingles(exprs(0), n)
      }))
    e.injectTableFunction((
      FunctionIdentifier("graft_version"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_version"),
      pipeline.VersionedTable.tvfBuilder))
    e.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_history"),
      pipeline.VersionedTable.historyTvfBuilder))
    e.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_changes"),
      pipeline.VersionedTable.changesTvfBuilder))
    e.injectTableFunction((
      FunctionIdentifier("graft_refs"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_refs"),
      pipeline.VersionedTable.refsTvfBuilder))
    e.injectTableFunction((
      FunctionIdentifier("graft_branch_history"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_branch_history"),
      pipeline.VersionedTable.branchHistoryTvfBuilder))
    e.injectTableFunction((
      FunctionIdentifier("graft_files"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_files"),
      pipeline.VersionedTable.filesTvfBuilder))
    e.injectTableFunction((
      FunctionIdentifier("graft_partitions"),
      new ExpressionInfo(pipeline.VersionedTable.getClass.getName,
        "graft_partitions"),
      pipeline.VersionedTable.partitionsTvfBuilder))
    // automatic stats-table file skipping (no-op until a table is
    // registered via StatsPruning.register; idempotent if the session
    // also appended it to experimental.extraOptimizations)
    e.injectOptimizerRule(session =>
      org.apache.spark.sql.graft.PruneScanByFileStats(session))
  }
}
