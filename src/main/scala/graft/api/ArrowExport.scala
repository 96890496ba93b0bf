package graft.api

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Arrow IPC materializer — the analog of the reference's
  * `Table.to_arrow` / `to_pandas` (vinum/api/table.py:439-457), which
  * hand back the fully materialized query result as an Arrow table.
  *
  * Built on arrow-java's PUBLIC API (VectorSchemaRoot +
  * ArrowStreamWriter), not Spark internals: the result is collected to
  * the driver — the reference's to_arrow has exactly these
  * materialization semantics — and encoded as an Arrow IPC stream any
  * Arrow consumer (pyarrow, pandas, polars, DuckDB) reads directly.
  * Scalar result types only (the engine's gated-output surface: integral,
  * floating, string, boolean, date, timestamp); nested outputs should be
  * exploded first, same as the oracle policy.
  */
object ArrowExport {

  /** Hard cap on exported rows. `to_arrow` is a DRIVER-SIDE materializer
    * for final, human/notebook-scale results — the reference's tests max
    * out at tens of thousands of rows. At cluster scale an unguarded
    * collect() of an intermediate frame is a driver OOM; the limit turns
    * that mistake into an immediate, explicit error instead.
    */
  val MaxExportRows: Long = 10_000_000L

  /** The DataFrame's rows as one Arrow IPC stream (schema + one batch).
    *
    * Collects to the driver by design (the reference's `to_arrow`
    * semantics) and refuses more than [[MaxExportRows]] rows — for a
    * large result, write distributed instead: `df.write.parquet(path)`
    * (pyarrow/DuckDB read parquet datasets natively).
    */
  def toArrowIpc(df: DataFrame): Array[Byte] =
    toArrowIpcCapped(df, MaxExportRows)

  private[graft] def toArrowIpcCapped(df: DataFrame, cap: Long): Array[Byte] = {
    // cap + 1 must stay an Int for limit(); a cap at/over Int.MaxValue
    // would overflow toInt to a negative limit and fail far from here
    // with an unrelated analysis error — reject it with the real reason
    require(cap > 0 && cap < Int.MaxValue,
      s"driver-side export cap must be in (0, ${Int.MaxValue}), got $cap; " +
        "use writeArrowIpcFiles for exports that large")
    // single job: collect at most cap+1 rows, so the overflow check and
    // the materialization share one execution
    val rows = df.limit((cap + 1).toInt).collect()
    require(rows.length <= cap,
      s"toArrowIpc materializes to the DRIVER and the result exceeds " +
        s"$cap rows; use df.write.parquet(...) for large results")
    val sparkSchema = df.schema
    val fields = sparkSchema.fields.map(f => arrowField(f)).toSeq
    val allocator = new RootAllocator(Long.MaxValue)
    try {
      val root = VectorSchemaRoot.create(new ArrowSchema(fields.asJava), allocator)
      try {
        root.allocateNew()
        rows.zipWithIndex.foreach { case (row, i) =>
          sparkSchema.fields.zipWithIndex.foreach { case (f, c) =>
            writeCell(root.getVector(c), i, row, c, f.dataType)
          }
        }
        root.setRowCount(rows.length)
        val out = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, out)
        try { writer.start(); writer.writeBatch(); writer.end() }
        finally writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Ingest an Arrow IPC stream as a Table-ready DataFrame — the analog
    * of the reference's `from_arrow` (vinum/api/table.py:95-180). Inverse
    * of [[toArrowIpc]] over the same scalar type surface.
    */
  /** DISTRIBUTED Arrow export — the scale path [[toArrowIpc]]'s cap
    * error points away from when parquet is not an option: every
    * partition writes its own Arrow IPC stream file
    * (`part-<id>.arrow`) straight from the executor, batched
    * `batchRows` rows at a time, so nothing ever materializes on the
    * driver and output size is bounded only by storage. `dir` must be
    * a path every executor can write (shared filesystem / fuse mount —
    * same contract as any Spark file sink). Returns the row count.
    *
    * Empty partitions write no file; each file is independently
    * readable by any Arrow consumer (pyarrow `ipc.open_stream`,
    * [[fromArrowIpc]] per file).
    */
  def writeArrowIpcFiles(df: DataFrame, dir: String,
                         batchRows: Int = 4096): Long = {
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    val sparkSchema = df.schema
    // validate the type surface eagerly, driver-side — a failure inside
    // an executor task would surface as a generic task error
    sparkSchema.fields.foreach(arrowField)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val counter = df.sparkSession.sparkContext.longAccumulator("arrow_rows")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        writePartitionFile(sparkSchema, it, dir, tc.partitionId(),
          tc.taskAttemptId(), batchRows, counter.add)
      }
    }
    counter.value
  }

  /** One task attempt's write of `part-<pid>.arrow` — factored out of
    * [[writeArrowIpcFiles]] so the task-commit protocol is directly
    * testable under duplicate and mid-write-failure attempts
    * (TableApiSpec exercises both).
    *
    * Protocol: write to an attempt-private temp name and atomically
    * rename on success — a retried or speculative attempt never
    * interleaves bytes into the final file, and a task that dies
    * mid-write leaves only an invisible temp (readers filter on the
    * .arrow suffix), which this attempt deletes on its own failure.
    * Both attempts of a deterministic partition produce identical
    * bytes, so last-rename-wins is safe. `addRows` fires as batches
    * are written; under Spark it is a LongAccumulator.add, which the
    * action applies once per SUCCESSFUL task only — a failed attempt's
    * partial adds are never folded into the job's counter.
    */
  private[graft] def writePartitionFile(sparkSchema: StructType,
                                        it: Iterator[Row], dir: String,
                                        pid: Int, attemptId: Long,
                                        batchRows: Int,
                                        addRows: Long => Unit): Unit = {
    val tmp = java.nio.file.Paths.get(
      s"$dir/.part-$pid.attempt-$attemptId.tmp")
    val dst = java.nio.file.Paths.get(s"$dir/part-$pid.arrow")
    var committed = false
    try {
      val fields = sparkSchema.fields.map(arrowField).toSeq
      val allocator = new RootAllocator(Long.MaxValue)
      try {
        val root = VectorSchemaRoot.create(
          new ArrowSchema(fields.asJava), allocator)
        try {
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(tmp.toFile))
          val writer = new ArrowStreamWriter(root, null, out)
          try {
            writer.start()
            while (it.hasNext) {
              root.allocateNew()
              var n = 0
              while (n < batchRows && it.hasNext) {
                val row = it.next()
                sparkSchema.fields.zipWithIndex.foreach { case (f, c) =>
                  writeCell(root.getVector(c), n, row, c, f.dataType)
                }
                n += 1
              }
              root.setRowCount(n)
              writer.writeBatch()
              addRows(n.toLong)
            }
            writer.end()
          } finally { writer.close(); out.close() }
        } finally root.close()
      } finally allocator.close()
      java.nio.file.Files.move(tmp, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      committed = true
    } finally {
      if (!committed) java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  def fromArrowIpc(spark: org.apache.spark.sql.SparkSession,
                   bytes: Array[Byte]): DataFrame = {
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val allocator = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkSchema = StructType(root.getSchema.getFields.asScala.toSeq.map(sparkField))
      val rows = Iterator.continually(reader.loadNextBatch()).takeWhile(identity).flatMap { _ =>
        (0 until root.getRowCount).map { i =>
          Row.fromSeq(sparkSchema.fields.indices.map { c =>
            readCell(root.getVector(c), i, sparkSchema.fields(c).dataType)
          })
        }
      }.toList
      spark.createDataFrame(rows.asJava, sparkSchema)
    } finally { reader.close(); allocator.close() }
  }

  private def sparkField(f: Field): StructField = {
    val dt: DataType = f.getType match {
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 64 => LongType
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 32 => IntegerType
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 16 => ShortType
      case t: ArrowType.Int if t.getIsSigned && t.getBitWidth == 8  => ByteType
      case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case t: ArrowType.FloatingPoint if t.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8          => StringType
      case _: ArrowType.Bool          => BooleanType
      case _: ArrowType.Date          => DateType
      case t: ArrowType.Timestamp if t.getUnit == TimeUnit.MICROSECOND =>
        // tz-tagged timestamps are instants; untagged ones are wall time
        if (t.getTimezone != null) TimestampType else TimestampNTZType
      case other => throw new IllegalArgumentException(
        s"unsupported arrow type $other for '${f.getName}' — signed " +
          "8/16/32/64-bit ints, single/double floats, utf8, bool, " +
          "date32, and microsecond timestamps only")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  private def readCell(v: FieldVector, i: Int, dt: DataType): Any = {
    if (v.isNull(i)) return null
    v match {
      case x: BigIntVector   => x.get(i)
      case x: IntVector      => x.get(i)
      case x: SmallIntVector => x.get(i)
      case x: TinyIntVector  => x.get(i)
      case x: Float8Vector   => x.get(i)
      case x: Float4Vector   => x.get(i)
      case x: VarCharVector =>
        new String(x.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case x: BitVector => x.get(i) == 1
      case x: DateDayVector =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i).toLong))
      case x: TimeStampMicroTZVector =>
        val micros = x.get(i)
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case x: TimeStampMicroVector =>
        val micros = x.get(i)
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case x => throw new IllegalStateException(s"unhandled vector ${x.getClass}/$dt")
    }
  }

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case ShortType   => new ArrowType.Int(16, true)
      case ByteType    => new ArrowType.Int(8, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType  => ArrowType.Utf8.INSTANCE
      case BooleanType => ArrowType.Bool.INSTANCE
      case DateType    => new ArrowType.Date(DateUnit.DAY)
      case TimestampType    => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case other =>
        throw new IllegalArgumentException(
          s"toArrowIpc supports scalar result columns only, got $other " +
            s"for '${f.name}' — explode nested outputs first")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  private def writeCell(v: FieldVector, i: Int, row: Row, c: Int,
                        dt: DataType): Unit = {
    if (row.isNullAt(c)) {
      v match {
        case x: BaseFixedWidthVector    => x.setNull(i)
        case x: BaseVariableWidthVector => x.setNull(i)
        case x => throw new IllegalStateException(s"unhandled null vector ${x.getClass}")
      }
      return
    }
    (v, dt) match {
      case (x: BigIntVector, _)   => x.setSafe(i, row.getLong(c))
      case (x: IntVector, _)      => x.setSafe(i, row.getInt(c))
      case (x: SmallIntVector, _) => x.setSafe(i, row.getShort(c))
      case (x: TinyIntVector, _)  => x.setSafe(i, row.getByte(c))
      case (x: Float8Vector, _)   => x.setSafe(i, row.getDouble(c))
      case (x: Float4Vector, _)   => x.setSafe(i, row.getFloat(c))
      case (x: VarCharVector, _) =>
        x.setSafe(i, row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x: BitVector, _) => x.setSafe(i, if (row.getBoolean(c)) 1 else 0)
      case (x: DateDayVector, _) =>
        x.setSafe(i, row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
      case (x: TimeStampMicroVector, TimestampNTZType) =>
        val ldt = row.getAs[java.time.LocalDateTime](c)
        x.setSafe(i, ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
          + ldt.getNano / 1000L)
      case (x: TimeStampMicroTZVector, _) =>
        val ts = row.getAs[java.sql.Timestamp](c)
        x.setSafe(i, Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      case (x, t) =>
        throw new IllegalStateException(s"unhandled vector ${x.getClass}/$t")
    }
  }
}
