package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

/** Manifest-scale stress probe (SURVEY §7 evidence, rounds 19-20).
  *
  * Round 19 measured the single-JSON manifest's ceiling on the
  * FILE-COUNT axis: 1e4 entries = 5.7 MB / sub-second ops; 1e5 = 57 MB /
  * 1-2 s; 1e6 = 573 MB, 52-88 s per op, OOMs an 8 GB driver. That
  * evidence drove the round-20 two-level manifest (SURVEY §7.45).
  *
  * Round 20 measures BOTH layouts side by side. For n in {1e4, 1e5, 1e6}
  * synthetic file entries (realistic per-file stats: 3 columns' min/max +
  * an identity partition tuple + hll/cnt sketch keys):
  *   - legacy (threshold forced past n): publish / plan / commit, as r19
  *     — skipped at 1e6 (the r19 numbers stand; re-running risks the
  *     measured OOM for no new information);
  *   - sharded: split (one-time reshard), plan_full (parallel parse of
  *     every shard), plan_pruned (partition probe parsing surviving
  *     shards only), commit_1file (read + publish appending ONE file —
  *     exactly one shard rewrites), and the on-disk list + shard sizes.
  * ONE JSON line per (layout, n) on stdout.
  *
  * Methodology: medians of 3 reps after 1 warmup rep (JIT); tmpfs-backed
  * temp dirs, so the numbers are CPU/alloc cost, not disk.
  */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ts", TimestampNTZType),
      StructField("v", DoubleType), StructField("p", LongType)))
    def statsFor(i: Int): Map[String, (String, String)] = Map(
      "k" -> (s"${i * 1000L}", s"${i * 1000L + 999L}"),
      "ts" -> (s"${1700000000000000L + i * 60000000L}",
        s"${1700000000000000L + (i + 1) * 60000000L}"),
      "v" -> ("0.0", "1.0"),
      "p" -> (s"${i % 365}", s"${i % 365}"),
      "part:p" -> (s"${i % 365}", s"${i % 365}"))
    def bloomsFor(i: Int): Map[String, String] = Map(
      "hll:k" -> ("A" * 64), "cnt:k" -> "1000", "cnt:v" -> "998")
    def medianMs(reps: Int)(f: => Unit): Double = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      ts.sorted.apply(reps / 2)
    }
    def cleanup(dir: String): Unit = {
      val sd = Paths.get(dir, "_graft_manifest_shards")
      if (Files.exists(sd)) {
        val s = Files.list(sd)
        try s.iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
        finally s.close()
        Files.deleteIfExists(sd)
      }
      val s = Files.list(Paths.get(dir))
      try s.iterator().forEachRemaining(p => { Files.deleteIfExists(p); () })
      finally s.close()
      Files.deleteIfExists(Paths.get(dir))
    }
    val prop = "graft.manifest.shard.threshold"
    Seq(10000, 100000, 1000000).foreach { n =>
      val files = (0 until n).map(i => (f"epoch-$i%d-part-00000.kv", 1000L))
      val stats = files.map { case (nm, _) =>
        nm -> statsFor(nm.split('-')(1).toInt) }.toMap
      val blooms = files.map { case (nm, _) =>
        nm -> bloomsFor(nm.split('-')(1).toInt) }.toMap
      // ---- legacy single JSON (r19's measurement, kept for comparison;
      // 1e6 skipped: measured 52-88 s/op and an 8 GB-driver OOM) --------
      if (n <= 100000) {
        sys.props(prop) = Int.MaxValue.toString
        val dir = Files.createTempDirectory(s"graft_mprobe_leg_$n").toString
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
        println(s"""{"layout":"legacy","files":$n,""" +
          s""""manifest_mb":${bytes / 1048576.0},""" +
          s""""publish_ms":$publish,"plan_ms":$plan,"commit_ms":$commit}""")
        cleanup(dir)
        sys.props.remove(prop): Unit
      }
      // ---- two-level (sharded) ----------------------------------------
      locally {
        val dir = Files.createTempDirectory(s"graft_mprobe_sh_$n").toString
        val split =
          if (n <= 100000) {
            // legacy seed + timed split: the one-time migration cost a
            // real table pays when it crosses the threshold
            sys.props(prop) = Int.MaxValue.toString
            GraftKvSink.writeManifest(dir, schema, files, stats = stats,
              blooms = blooms)
            sys.props.remove(prop)
            medianMs(1) {
              GraftKvSink.reshardManifest(dir, math.max(8, n / 10000))
            }
          } else {
            // 1e6 seeds SHARDED directly (the default threshold splits at
            // write time) — seeding via the legacy path would build the
            // exact 573 MB single Jackson tree whose measured OOM the
            // legacy arm above is skipped to avoid. The split-cost
            // analogue here is a full RE-SPLIT to a different count
            // (every shard rewrites).
            GraftKvSink.writeManifest(dir, schema, files, stats = stats,
              blooms = blooms)
            medianMs(1) {
              // a DIFFERENT count than the auto-split chose — same-count
              // resharding is sig-equal and would measure a no-op
              GraftKvSink.reshardManifest(dir, 128)
            }
          }
        val planFull = medianMs(3) {
          GraftKvSink.readManifest(GraftKvSink.manifestPath(dir)): Unit
        }
        val probeFilter = Seq[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.EqualTo("p", 17L))
        var prunedShards = (0, 0)
        val planPruned = medianMs(3) {
          val (_, a, b) = GraftKvSink.readManifestPruned(
            GraftKvSink.manifestPath(dir), probeFilter)
          prunedShards = (a, b)
        }
        var rep = 0
        val commit1 = medianMs(3) {
          // a FRESH file each rep: re-appending the same one would make
          // reps 2-3 sig-equal no-op commits and the median would measure
          // the list write alone, not the one-shard rewrite
          rep += 1
          val m = GraftKvSink.readManifest(GraftKvSink.manifestPath(dir))
          val extra = (s"epoch-17-part-9999$rep.kv", 1000L)
          GraftKvSink.writeManifest(dir, m.schema, m.files :+ extra,
            stats = m.stats + (extra._1 -> statsFor(17)),
            blooms = m.blooms + (extra._1 -> bloomsFor(17)),
            priorHint = Some(m))
        }
        val listBytes = Files.size(GraftKvSink.manifestPath(dir))
        val shardBytes = {
          val s = Files.list(Paths.get(dir, "_graft_manifest_shards"))
          try {
            var t = 0L
            s.iterator().forEachRemaining(p => t += Files.size(p))
            t
          } finally s.close()
        }
        println(s"""{"layout":"sharded","files":$n,""" +
          s""""list_mb":${listBytes / 1048576.0},""" +
          s""""shards_mb":${shardBytes / 1048576.0},""" +
          s""""split_ms":$split,"plan_full_ms":$planFull,""" +
          s""""plan_pruned_ms":$planPruned,""" +
          s""""pruned_shards":"${prunedShards._1}/${prunedShards._2}",""" +
          s""""commit_1file_ms":$commit1}""")
        cleanup(dir)
      }
    }
  }
}
