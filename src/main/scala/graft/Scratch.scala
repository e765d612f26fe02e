package graft

import org.apache.spark.sql.SparkSession

/** Root directory for derived layouts (format round-trips, bucketed-table
  * stamps, iterative-loop checkpoints). The default derives from the
  * session, never a literal local path: `spark.sql.warehouse.dir` is the
  * one location every deployment already points at durable, cluster-visible
  * storage (HDFS/S3 on a real cluster; a project-local dir in local mode).
  * A bare machine-local path would resolve per-machine on a cluster, so an
  * executor-written file would be invisible to the next stage's readers.
  * Both confs are runtime-settable (`spark.conf.set`), no restart needed:
  *
  *  - `spark.graft.scratchDir`    — format re-layouts and stamps;
  *    defaults to `<spark.sql.warehouse.dir>/graft_scratch`.
  *  - `spark.graft.checkpointDir` — iterative-loop hop materializations
  *    (x15 connected components); defaults to the scratch dir.
  */
object Scratch {
  def dir(s: SparkSession): String =
    s.conf.get("spark.graft.scratchDir", {
      // warehouse.dir is a URI (file:/... in local mode); strip the scheme
      // so java.io file ops in layout stamps keep working on local paths.
      val wh = s.conf.get("spark.sql.warehouse.dir")
      val base = if (wh.startsWith("file:")) new java.net.URI(wh).getPath else wh
      s"${base.stripSuffix("/")}/graft_scratch"
    })

  def checkpointDir(s: SparkSession): String =
    s.conf.get("spark.graft.checkpointDir", dir(s))
}
