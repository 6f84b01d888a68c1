package graft

import org.apache.spark.sql.SparkSession

/** The ASYNC-COMPACTOR role of [[graft.operators.StandingIndex]]'s
  * one-writer-per-role deployment shape — its own JVM and SparkSession
  * against the SAME warehouse root as the continuous ingest writer,
  * repeatedly merging the committed prefix whenever segments accumulate.
  * This is the process layout the reference deploys: Hudi compaction
  * running beside a continuous DeltaStreamer upsert loop (ref
  * `hudi/debezium_hudi_demo/demonstration_notes.md` "Run Hudi
  * DeltaStreamer Continuously", `deltastreamer_jobs_cont_bkgd.sh` —
  * maintenance and ingest as separate long-running processes over one
  * table).
  *
  * Cross-JVM mechanics under test when ConcurrentMaintenanceSpec forks
  * this main beside its in-process folder:
  *
  *   - the fresh JVM's in-memory catalog knows NO segment table — every
  *     read re-registers from the shared warehouse root
  *     (StandingIndex.resolveTable, the shared-metastore stand-in);
  *   - every pointer commit is an OCC version claim — losing the CAS to
  *     the folder's concurrent fold throws the NAMED collision, which
  *     this role counts and retries from fresh state (never a silent
  *     lost update on either side);
  *   - physical namespaces are disjoint by role (`_seg` folds vs `_cmp`
  *     generations), so the two roles never contend for a staging
  *     rename — all contention surfaces at the pointer, loudly.
  *
  * args: `<warehouseDir> <indexName> <attempts> <readyMarkerPath>`.
  * Prints one `ASYNC_COMPACTOR done=<n> collided=<n>` line for the
  * driving spec.
  */
object AsyncCompactor {
  def main(args: Array[String]): Unit = {
    val Array(wh, name, attemptsStr, marker) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-async-compactor")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ix = new graft.operators.StandingIndex(
      spark, name, buckets = 2, keys = Seq("band", "bk"))
    // signal readiness only once the session is live, so the spec's
    // folder loop overlaps real compaction work, not JVM startup
    java.nio.file.Files.writeString(java.nio.file.Paths.get(marker), "ready")
    var done = 0
    var collided = 0
    (1 to attemptsStr.toInt).foreach { _ =>
      try if (ix.compactIfOver(maxLive = 1)) done += 1
      catch {
        // both loud shapes are the TYPED collision: the OCC
        // version-claim loss and the publish-collision guard — retried
        // from fresh state
        case _: graft.operators.OccCollisionException =>
          collided += 1
      }
      Thread.sleep(100L)
    }
    println(s"ASYNC_COMPACTOR done=$done collided=$collided")
    spark.stop()
  }
}
