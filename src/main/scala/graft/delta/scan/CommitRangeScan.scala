package graft.delta.scan

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.delta.Snapshot
import graft.delta.log.{LogSegment, Replay}

/** Incremental commit-range scan: the rows added by commits in
  * `(fromExclusive, endV]`, read from each commit's OWN add actions —
  * the shared core of the streaming source's tail batches and the batch
  * `startingVersion`/`endingVersion` read (incremental ETL).
  *
  * The commit JSONs — not the reconciled file list — are the source of
  * truth, twice over: reconciliation stamps checkpoint-sourced files
  * with the CHECKPOINT's version (deriving the tail from commit_version
  * would re-emit the whole table after a checkpoint), and a file
  * appended then compacted away WITHIN the span is no longer live at
  * endV (a liveness-filtered read would silently LOSE its rows — the
  * data file itself exists until VACUUM). dataChange=false adds
  * (OPTIMIZE rewrites, checkpoint contents) are already-delivered rows
  * and are skipped. With `ignoreChanges=true`, a DELETE/UPDATE commit's
  * re-added files emit in full — the standard "may see duplicates"
  * contract; otherwise a data-changing remove in the span fails fast.
  *
  * Scale shape: the driver touches only the span's commit JSONs (small
  * by construction — checkpoints bound tail length); the data read is a
  * plain composed scan over the collected add files.
  */
object CommitRangeScan {

  def addsBetween(spark: SparkSession, path: String, snap: Snapshot,
      fromExclusive: Long, endV: Long, ignoreChanges: Boolean,
      contextLabel: String): DataFrame = {
    val files = scala.collection.mutable.LinkedHashMap.empty[
      String, DeltaScan.ScanFile]
    val fs = LogSegment.fs(spark, new Path(path))
    val logDir = new Path(new Path(path), "_delta_log")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    for (v <- (fromExclusive + 1) to endV) {
      val commit = new Path(logDir, f"$v%020d.json")
      if (!fs.exists(commit))
        throw new IllegalStateException(
          s"$contextLabel cannot read commit $v of $path (cleaned up?)")
      val in = fs.open(commit)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toVector finally in.close()
      for (line <- lines if line.nonEmpty) {
        val n = mapper.readTree(line)
        if (!ignoreChanges && n.has("remove") &&
            Option(n.get("remove").get("dataChange")).forall(_.asBoolean()))
          throw new UnsupportedOperationException(
            s"$contextLabel found a data-changing remove in commit $v of " +
              s"$path (DELETE/UPDATE/MERGE). Incremental reads require an " +
              "append-only span; set ignoreChanges=true to skip such commits.")
        if (n.has("add") &&
            Option(n.get("add").get("dataChange")).forall(_.asBoolean())) {
          val a = n.get("add")
          val rel = a.get("path").asText()
          files.remove(rel) // last add for a path wins
          files.put(rel, DeltaScan.ScanFile(rel,
            Replay.partitionValuesOf(a), Replay.dvDescriptorOf(a)))
        }
      }
    }
    DeltaScan.buildForFiles(snap, files.values.toSeq)
  }
}
