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

    // Variant B — legacy era: a REAL `INT64 TIMESTAMP(NANOS,
    // isAdjustedToUTC=false)` file, written with parquet-mr's Group API
    // (Spark cannot write this annotation itself). This exercises the
    // genuine [PARQUET_TYPE_ILLEGAL]-unless-nanosAsLong read path that
    // actually failed in r7, not a plain-long emulation of it.
    val dirB = java.nio.file.Files.createTempDirectory("graft_ev_nanos").toString
    writeNanosEventsFile(s"$dirB/events.parquet",
      base.select($"event_id", ($"us" * 1000L).as("ns"),
          $"user_id", $"event_type", $"value", $"props")
        .collect().toIndexedSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))))

    // The annotation must actually round-trip: under nanosAsLong the raw
    // read surfaces `ts` as LongType (the r7 failure path), not timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(spark.read.parquet(s"$dirB/events.parquet").schema("ts").dataType ===
      org.apache.spark.sql.types.LongType,
      "variant B must be a genuine TIMESTAMP(NANOS) file read as long")

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

  /** Writes a single-row-group parquet file whose `ts` column is annotated
    * `INT64 TIMESTAMP(NANOS, isAdjustedToUTC=false)` — the legacy events
    * layout — using parquet-mr's example Group writer directly, since no
    * Spark writer can emit the NANOS annotation.
    */
  private def writeNanosEventsFile(
      dir: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/part-00000.parquet"))
      .withType(schema)
      .withConf(new org.apache.hadoop.conf.Configuration())
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns, uid, et, v, props) =>
      val g = gf.newGroup()
      g.add("event_id", id); g.add("ts", ns); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", props)
      writer.write(g)
    } finally writer.close()
  }
}
