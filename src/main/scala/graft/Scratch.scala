package graft

import org.apache.spark.sql.SparkSession

/** Root directory for derived layouts (format round-trips, bucketed-table
  * stamps, iterative-loop checkpoints). Local mode lives happily on the
  * /tmp default; a REAL cluster must point these at shared storage
  * (HDFS/S3) — a bare local path resolves per-machine there, so an
  * executor-written file would be invisible to the next stage's readers.
  * Both confs are runtime-settable (`spark.conf.set`), no restart needed:
  *
  *  - `spark.graft.scratchDir`    — format re-layouts and stamps.
  *  - `spark.graft.checkpointDir` — iterative-loop hop materializations
  *    (x15 connected components); defaults to the scratch dir.
  */
object Scratch {
  def dir(s: SparkSession): String =
    s.conf.get("spark.graft.scratchDir", "/tmp")

  def checkpointDir(s: SparkSession): String =
    s.conf.get("spark.graft.checkpointDir", dir(s))
}
