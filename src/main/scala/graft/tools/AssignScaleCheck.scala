package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measures the IVF ASSIGN-stage work (not end-to-end wall time, where
  * the 1/targetListSize constant hides the asymptote at bench scales)
  * across corpus sizes: for each directory's embeddings table it records
  * N, nlist = autoNlist(N), and the two-level route's measured candidate
  * join size + meta width — per-point assign work = candidates/N + m.
  * The flat route's per-point work is nlist (∝ N); two-level should grow
  * ≈ √(N ratio) instead. One JSON line on stdout, mirrored to
  * target/assign_scale_latest.json.
  *
  *   AssignScaleCheck /root/testdata/sf0.1 target/sf1.0
  */
object AssignScaleCheck {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/sf1.0")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.fieldId.read.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Row(dir: String, n: Long, nlist: Int, m: Int,
        candidates: Long, perPointTwoLevel: Double, perPointFlat: Long,
        sec: Double)
    val rows = dirs.map { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val n = emb.count()
      val nlist = Similarity.autoNlist(n)
      val t0 = System.nanoTime()
      val (cand, m) = Similarity.twoLevelAssignStats(
        emb, "embedding", "vec_id", nlist)
      val sec = (System.nanoTime() - t0) / 1e9
      Row(d, n, nlist, m, cand, cand.toDouble / n + m, nlist, sec)
    }
    val growthN = rows.last.n.toDouble / rows.head.n
    val growthTwoLevel =
      rows.last.perPointTwoLevel / rows.head.perPointTwoLevel
    val growthFlat =
      rows.last.perPointFlat.toDouble / rows.head.perPointFlat
    val rowsJson = rows.map { r =>
      f"""{"dir":"${r.dir}","n":${r.n},"nlist":${r.nlist},"m":${r.m},""" +
        f""""candidates":${r.candidates},""" +
        f""""per_point_two_level":${r.perPointTwoLevel}%.1f,""" +
        f""""per_point_flat":${r.perPointFlat},"sec":${r.sec}%.2f}"""
    }.mkString("[", ",", "]")
    val line =
      f"""{"metric":"assign_scale","n_growth":$growthN%.2f,""" +
        f""""sqrt_n_growth":${math.sqrt(growthN)}%.2f,""" +
        f""""per_point_growth_two_level":$growthTwoLevel%.2f,""" +
        f""""per_point_growth_flat":$growthFlat%.2f,"rows":$rowsJson}"""
    println(line)
    val p = java.nio.file.Paths.get("target", "assign_scale_latest.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
