package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and emits one JSON line (stdout) plus a
  * `bench.json` file (cwd, or `SPARK_GRAFT_BENCH_OUT`) so the driver can
  * parse the result even when stdout is prefixed by the sbt logger.
  *
  * A warmup pass at sf0.001 runs first so session startup + whole-stage
  * codegen compilation are not billed to the first timed query (round-1
  * bench attributed ~6.5s of warmup to q16). Failures are captured
  * per-query (`"err"` map) and flip the exit code — a broken query can't
  * masquerade as a green bench.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: run the whole set once at the smallest scale factor.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    val errs = scala.collection.mutable.Map[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}"""

    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try Files.writeString(Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }

    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
