package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // size the codegen cache to the catalog (Bench's fix — the
      // default 100 entries re-Janino-compile every query's units)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // clear stale results: a leftover dump from an older query numbering
    // would show up as phantom rows-only entries in the compare. SAFETY:
    // only ever delete something that provably IS a prior dump — a
    // mistyped outDir ('.', a shared directory) must refuse, not destroy.
    val out = new java.io.File(outDir)
    if (out.exists()) {
      def isQueryDump(f: java.io.File): Boolean = f.isDirectory &&
        f.listFiles().forall { c =>
          val n = c.getName
          n == "_SUCCESS" || n.endsWith(".parquet") || n.endsWith(".crc") ||
            n.startsWith(".") || n.startsWith("_")
        }
      val children = Option(out.listFiles()).getOrElse(Array.empty)
      val strays = children.filterNot(c =>
        c.getName == "oracle_sql.json" || isQueryDump(c))
      require(strays.isEmpty,
        s"refusing to clear $outDir: it contains entries that are not " +
          s"prior query dumps (${strays.take(3).map(_.getName).mkString(", ")}" +
          "...); point Verify at an empty or dedicated directory")
      graft.util.Fs.deleteRecursively(out)
    }
    out.mkdirs()
    // dev-loop filter (regex on query name, same contract as Bench's);
    // the driver leaves it unset so official dumps are always complete
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // synchronously drop finished queries' cached/localCheckpoint
      // blocks (same hygiene as Bench — measured 2x tail inflation
      // without it on the full catalog)
      Bench.freeBlocks(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
