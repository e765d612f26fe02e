package graft

import org.apache.spark.sql.functions._

/** Pin for the events-table physical-schema drift (r7 postmortem).
  *
  * The testdata generator has shipped `events.ts` in two physical layouts:
  * INT64 TIMESTAMP(NANOS) (read as `long` under `nanosAsLong=true`) and
  * INT64 TIMESTAMP_MICROS with isAdjustedToUTC=0 (read as `timestamp_ntz`).
  * A regeneration flipping between them once took out 25 query keys because
  * the loader assumed one era forever. This spec writes a tiny events file
  * in BOTH layouts and asserts [[Tables.events]] normalizes them to the
  * identical logical schema AND identical epoch values — if either branch
  * of the loader rots, this fails before the driver's correctness gate does.
  */
class TablesDriftSpec extends SparkSpec {

  test("events loader normalizes micros-NTZ and legacy long-nanos layouts identically") {
    import spark.implicits._
    val us = 1700000000123456L // epoch micros, exercises sub-second digits
    val base = Seq(
      (1L, us, 7L, "click", 1.5, "{\"k\":1}"),
      (2L, us + 3600L * 1000000L, 8L, "view", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")

    // Variant A — current era: TIMESTAMP_MICROS, isAdjustedToUTC=0. Spark
    // always writes timestamp_ntz as annotated INT64 micros.
    val dirA = java.nio.file.Files.createTempDirectory("graft_ev_micros").toString
    base.select($"event_id",
        timestamp_micros($"us").cast("timestamp_ntz").as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")

    // Variant B — legacy era: the nanos file surfaces to the reader as a
    // plain INT64 `ts` holding epoch-nanos (nanosAsLong=true), which a bare
    // long column emulates exactly at the DataFrame level.
    val dirB = java.nio.file.Files.createTempDirectory("graft_ev_nanos").toString
    base.select($"event_id",
        ($"us" * 1000L).as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")

    val a = Tables.events(spark, dirA)
    val b = Tables.events(spark, dirB)

    assert(a.schema === b.schema,
      s"loader branches must expose one logical schema:\n${a.schema}\nvs\n${b.schema}")
    assert(a.columns.toSeq ===
      Seq("event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts"))

    val rowsA = a.select($"event_id", $"ts_ns", unix_micros($"ts").as("ts_us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rowsB = b.select($"event_id", $"ts_ns", unix_micros($"ts").as("ts_us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rowsA.sameElements(rowsB), "epoch values must be identical across layouts")
    assert(rowsA(0) === ((1L, us * 1000L, us)))
  }
}
