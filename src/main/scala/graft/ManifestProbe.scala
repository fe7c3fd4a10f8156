package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Manifest-scale stress probe (SURVEY §7 evidence, round 19): measure the
  * single-JSON manifest's actual ceiling on the FILE-COUNT axis before
  * deciding whether round 20 builds the two-level manifest-list split.
  *
  * For n in {1e4, 1e5, 1e6} synthetic file entries (each with a realistic
  * per-file stats map: 3 columns' min/max + a partition tuple + hll/cnt
  * sketch keys), times the three operations a 100-TB table exercises:
  *   - publish  — writeManifest with priorHint (the in-commit write half)
  *   - commit   — readManifest + writeManifest (a real commit's full
  *                read-modify-publish under the lock)
  *   - plan     — readManifest alone (every scan/metadata resolution)
  * plus the on-disk manifest size. ONE JSON line per n on stdout.
  *
  * Methodology: times are medians of 3 reps after 1 warmup rep (JIT);
  * everything runs in one JVM against a tmpfs-backed temp dir, so the
  * numbers are CPU/alloc cost, not disk.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampNTZType),
      StructField("v", DoubleType)))
    def statsFor(i: Int): Map[String, (String, String)] = Map(
      "k" -> (s"${i * 1000L}", s"${i * 1000L + 999L}"),
      "ts" -> (s"${1700000000000000L + i * 60000000L}",
        s"${1700000000000000L + (i + 1) * 60000000L}"),
      "v" -> ("0.0", "1.0"),
      "part:days(ts)" -> (s"${19700 + i % 365}", s"${19700 + i % 365}"))
    def bloomsFor(i: Int): Map[String, String] = Map(
      "hll:k" -> ("A" * 64), "cnt:k" -> "1000", "cnt:v" -> "998")
    def medianMs(reps: Int)(f: => Unit): Double = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(reps / 2)
    }
    Seq(10000, 100000, 1000000).foreach { n =>
      val dir = Files.createTempDirectory(s"graft_mprobe_$n").toString
      val files = (0 until n).map(i => (f"epoch-$i%d-part-00000.kv", 1000L))
      val stats = files.map { case (nm, _) =>
        nm -> statsFor(nm.split('-')(1).toInt) }.toMap
      val blooms = files.map { case (nm, _) =>
        nm -> bloomsFor(nm.split('-')(1).toInt) }.toMap
      // warmup + timed publishes (write half only, prior in hand)
      GraftKvSink.writeManifest(dir, schema, files, stats = stats,
        blooms = blooms)
      val prior = GraftKvSink.readManifest(GraftKvSink.manifestPath(dir))
      val publish = medianMs(3) {
        GraftKvSink.writeManifest(dir, schema, files, stats = stats,
          blooms = blooms, priorHint = Some(prior))
      }
      val plan = medianMs(3) {
        GraftKvSink.readManifest(GraftKvSink.manifestPath(dir)): Unit
      }
      val commit = medianMs(3) {
        val m = GraftKvSink.readManifest(GraftKvSink.manifestPath(dir))
        GraftKvSink.writeManifest(dir, m.schema, m.files, stats = m.stats,
          blooms = m.blooms, priorHint = Some(m))
      }
      val bytes = Files.size(GraftKvSink.manifestPath(dir))
      println(s"""{"files":$n,"manifest_mb":${bytes / 1048576.0},""" +
        s""""publish_ms":$publish,"plan_ms":$plan,"commit_ms":$commit}""")
      val s = Files.list(Paths.get(dir))
      try s.iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
      finally s.close()
      Files.deleteIfExists(Paths.get(dir))
    }
  }
}
