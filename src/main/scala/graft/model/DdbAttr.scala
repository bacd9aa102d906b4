package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DynamoDB AttributeValue codec (SURVEY.md §1.1, §2.A `scan_ddb_export`).
  *
  * The reference's initial load is a DynamoDB PITR export
  * (`dynamodb:ExportTableToPointInTime`,
  * reference src/dynamodb-zero-etl-s3tables.ts:135): newline-delimited JSON,
  * one `{"Item":{attr:{TAG:value}}}` per line with type tags
  * S/N/B/BOOL/NULL/M/L/SS/NS/BS. This module maps that wire form to and from
  * typed Spark columns as pure Catalyst column expressions — `from_json` /
  * `to_json` / `transform` — so decode stays inside whole-stage codegen
  * (SURVEY §7.4: no UDFs in the ingest hot path).
  *
  * Scale: the decode is a per-row projection, embarrassingly parallel; no
  * shuffle, no driver involvement beyond building the expression tree.
  */
object DdbAttr {

  /** Field-metadata marker for heterogeneous `L`/`M` attributes: the target
    * column is `ArrayType(StringType)` / `MapType(StringType, StringType)`
    * whose leaves are JSON-encoded AttributeValues (`{"N":"1.5"}`), the
    * lossless mapping SURVEY §1.3/§7.5.2 pins for mixed-type lists — a plain
    * typed array would decode the off-type elements to null. */
  val HetKey = "ddbHet"
  val HetMeta: Metadata = new MetadataBuilder().putBoolean(HetKey, true).build()
  private def isHet(f: StructField): Boolean =
    f.metadata.contains(HetKey) && f.metadata.getBoolean(HetKey)

  /** Maximum nesting depth materialized inside a heterogeneous subtree.
    * DynamoDB itself caps documents at 32 levels; 4 covers the fixtures and
    * keeps the from_json schema small — deeper subtrees still decode (their
    * raw JSON rides a StringType leaf), they just stop being re-encodable. */
  val HetDepth = 4

  /** All-tags AttributeValue schema for heterogeneous subtrees: every scalar
    * tag plus L/M down to `depth`. */
  def hetAvSchema(depth: Int = HetDepth): StructType = {
    val scalars = Seq(
      StructField("S", StringType), StructField("N", StringType),
      StructField("BOOL", BooleanType), StructField("B", StringType),
      StructField("NULL", BooleanType),
      StructField("SS", ArrayType(StringType)),
      StructField("NS", ArrayType(StringType)),
      StructField("BS", ArrayType(StringType)))
    val nested =
      if (depth <= 0) Nil
      else Seq(
        StructField("L", ArrayType(hetAvSchema(depth - 1))),
        StructField("M", MapType(StringType, hetAvSchema(depth - 1))))
    StructType(scalars ++ nested)
  }

  /** Spark-side schema of one encoded AttributeValue holding `target`.
    * Only the tags reachable from `target` are materialized. */
  def avSchema(target: DataType): StructType = target match {
    case StringType => StructType(Seq(StructField("S", StringType)))
    case _: NumericType => StructType(Seq(StructField("N", StringType)))
    case BooleanType => StructType(Seq(StructField("BOOL", BooleanType)))
    case BinaryType => StructType(Seq(StructField("B", StringType)))
    case TimestampType | TimestampNTZType =>
      StructType(Seq(StructField("S", StringType)))
    case DateType => StructType(Seq(StructField("S", StringType)))
    case ArrayType(el, _) =>
      // lists arrive as L; string/number/binary sets may arrive as SS/NS/BS
      val setTag = el match {
        case StringType => Seq(StructField("SS", ArrayType(StringType)))
        case _: NumericType => Seq(StructField("NS", ArrayType(StringType)))
        case BinaryType => Seq(StructField("BS", ArrayType(StringType)))
        case _ => Nil
      }
      StructType(StructField("L", ArrayType(avSchema(el))) +: setTag)
    case st: StructType =>
      StructType(Seq(StructField("M", StructType(
        st.fields.map(f => StructField(f.name, avSchemaF(f)))))))
    case MapType(StringType, v, _) =>
      StructType(Seq(StructField("M", MapType(StringType, avSchema(v)))))
    case other =>
      throw new IllegalArgumentException(s"unsupported DynamoDB target type: $other")
  }

  /** Field-aware [[avSchema]]: heterogeneous-marked fields materialize the
    * all-tags subtree instead of the single-tag projection. */
  private def avSchemaF(f: StructField): StructType =
    if (isHet(f)) f.dataType match {
      case ArrayType(StringType, _) =>
        StructType(Seq(StructField("L", ArrayType(hetAvSchema()))))
      case MapType(StringType, StringType, _) =>
        StructType(Seq(StructField("M", MapType(StringType, hetAvSchema()))))
      case other => throw new IllegalArgumentException(
        s"heterogeneous marker only applies to string arrays/maps, not $other")
    }
    else avSchema(f.dataType)

  /** Schema of a whole export line for a target row schema. */
  def itemSchema(target: StructType): StructType =
    StructType(Seq(StructField("Item", StructType(
      target.fields.map(f => StructField(f.name, avSchemaF(f)))))))

  /** Decode one AttributeValue struct column into `target`. */
  def decodeValue(av: Column, target: DataType): Column = target match {
    case StringType => av.getField("S")
    case n: NumericType => av.getField("N").cast(n)
    case BooleanType => av.getField("BOOL")
    case BinaryType => unbase64(av.getField("B"))
    case TimestampType => av.getField("S").cast(TimestampType)
    case TimestampNTZType => av.getField("S").cast(TimestampNTZType)
    case DateType => av.getField("S").cast(DateType)
    case ArrayType(el, _) =>
      val fromList = transform(av.getField("L"), e => decodeValue(e, el))
      val fromSet = el match {
        case StringType => Some(av.getField("SS"))
        case n: NumericType =>
          Some(transform(av.getField("NS"), e => e.cast(n)))
        case BinaryType =>
          Some(transform(av.getField("BS"), e => unbase64(e)))
        case _ => None
      }
      fromSet.map(s => coalesce(fromList, s)).getOrElse(fromList)
    case st: StructType =>
      val m = av.getField("M")
      when(m.isNotNull, struct(
        st.fields.map(f => decodeValueF(m.getField(f.name), f).as(f.name)): _*))
    case MapType(StringType, v, _) =>
      transform_values(av.getField("M"), (_, value) => decodeValue(value, v))
    case other =>
      throw new IllegalArgumentException(s"unsupported DynamoDB target type: $other")
  }

  /** Field-aware [[decodeValue]]: heterogeneous-marked fields decode each
    * element/value to its AttributeValue JSON text (`{"N":"1.5"}`) — lossless
    * for mixed-type content where a typed decode would null the misfits. */
  private def decodeValueF(av: Column, f: StructField): Column =
    if (isHet(f)) f.dataType match {
      case ArrayType(StringType, _) =>
        transform(av.getField("L"), e => to_json(e))
      case MapType(StringType, StringType, _) =>
        transform_values(av.getField("M"), (_, v) => to_json(v))
      case other => throw new IllegalArgumentException(
        s"heterogeneous marker only applies to string arrays/maps, not $other")
    }
    else decodeValue(av, f.dataType)

  /** Parse a `Dataset`-of-JSON-lines export into typed columns.
    * `raw` must carry the export line in column `json`. Validation parity
    * with the reference's synth-time checks (src:58-66): requested key
    * columns must exist in the target schema. */
  def decode(raw: DataFrame, target: StructType, keyColumns: Seq[String] = Nil)
      : DataFrame = {
    keyColumns.foreach { k =>
      if (!target.fieldNames.contains(k))
        throw new IllegalArgumentException(
          s"key column '$k' missing from target schema ${target.simpleString}")
    }
    val parsed = raw.withColumn("_item",
      from_json(col("json"), itemSchema(target)).getField("Item"))
    parsed.select(target.fields.map(f =>
      decodeValueF(col("_item").getField(f.name), f).as(f.name)): _*)
  }

  /** Encode typed columns as one AttributeValue struct (to_json-ready).
    * Null values become the `NULL` tag, like the wire format. */
  def encodeValue(c: Column, dt: DataType): Column = {
    val tagged: Seq[(String, Column)] = dt match {
      case StringType => Seq("S" -> c)
      case _: NumericType => Seq("N" -> c.cast(StringType))
      case BooleanType => Seq("BOOL" -> c)
      case BinaryType => Seq("B" -> base64(c))
      case TimestampType | TimestampNTZType =>
        Seq("S" -> date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      case DateType => Seq("S" -> c.cast(StringType))
      case ArrayType(el, _) =>
        Seq("L" -> transform(c, e => encodeValue(e, el)))
      case st: StructType =>
        Seq("M" -> when(c.isNotNull, struct(st.fields.map(f =>
          encodeValueF(c.getField(f.name), f).as(f.name)): _*)))
      case MapType(StringType, v, _) =>
        Seq("M" -> transform_values(c, (_, value) => encodeValue(value, v)))
      case other =>
        throw new IllegalArgumentException(s"unsupported DynamoDB source type: $other")
    }
    // NULL tag carried alongside; to_json drops whichever side is null.
    val withNull = tagged :+ ("NULL" -> when(c.isNull, lit(true)))
    struct(withNull.map { case (t, v) =>
      (if (t == "NULL") v else when(c.isNotNull, v)).as(t)
    }: _*)
  }

  /** Field-aware [[encodeValue]]: heterogeneous-marked fields re-parse each
    * JSON-encoded AttributeValue leaf back into the tagged struct, so
    * encode ∘ decode is the identity on the wire form (canonical tag order). */
  private def encodeValueF(c: Column, f: StructField): Column =
    if (isHet(f)) {
      val tagged: Seq[(String, Column)] = f.dataType match {
        case ArrayType(StringType, _) =>
          Seq("L" -> transform(c, e => from_json(e, hetAvSchema())))
        case MapType(StringType, StringType, _) =>
          Seq("M" -> transform_values(c, (_, v) => from_json(v, hetAvSchema())))
        case other => throw new IllegalArgumentException(
          s"heterogeneous marker only applies to string arrays/maps, not $other")
      }
      val withNull = tagged :+ ("NULL" -> when(c.isNull, lit(true)))
      struct(withNull.map { case (t, v) =>
        (if (t == "NULL") v else when(c.isNotNull, v)).as(t)
      }: _*)
    }
    else encodeValue(c, f.dataType)

  /** Encode a whole row as an export JSON line (fixture/roundtrip path). */
  def encodeLine(schema: StructType): Column =
    to_json(struct(struct(schema.fields.map(f =>
      encodeValueF(col(f.name), f).as(f.name)): _*).as("Item")))

  // -------------------------------------------------------- schema inference

  /** Per-N-attribute value statistics driving numeric type inference. */
  private final case class NStats(fractional: Boolean, intDigits: Int,
      fracDigits: Int)

  /** DynamoDB `N` is an arbitrary-precision decimal of up to 38 significant
    * digits serialized as a string (SURVEY §1.1, §7.5.1) — the narrowest
    * Spark type that holds every observed value without silent precision
    * loss is chosen per attribute:
    *
    *   - integers of ≤ 18 digits            → LongType
    *   - integers of 19-38 digits           → DecimalType(38, 0)
    *   - fractional, ≤ 15 significant digits → DoubleType (double-exact)
    *   - anything wider                     → DecimalType(38, 18)
    */
  private def nType(st: NStats): DataType =
    if (!st.fractional && st.intDigits <= 18) LongType
    else if (!st.fractional) DecimalType(38, 0)
    else if (st.intDigits + st.fracDigits <= 15) DoubleType
    else DecimalType(38, 18)

  /** Infer a relational schema from raw export lines — the
    * `glue:CreateTable` analog (reference src:112). Two passes, both
    * distributed: (1) `spark.read.json` discovers which tags each attribute
    * carries; (2) one aggregate collects per-`N`-attribute value stats —
    * fractional part and digit counts, at EVERY nesting depth (nested `M`
    * struct members included, so `{"M":{"x":{"N":"1.5"}}}` infers Double,
    * not a lossy Long) — deciding long/double/decimal per [[nType]]. */
  def inferSchema(spark: SparkSession, raw: DataFrame): StructType = {
    val avShaped = spark.read.json(raw.select(col("json").as("value"))
      .as(org.apache.spark.sql.Encoders.STRING))
    val itemType = avShaped.schema.fields.find(_.name == "Item").map(_.dataType) match {
      case Some(st: StructType) => st
      case _ => throw new IllegalArgumentException(
        "not a DynamoDB export: no Item object found")
    }
    // every N-tagged attribute path ("attr", "attr.sub", ...) with its value
    // column in the parsed shape — same dotted names fieldType builds below
    def nPaths(prefix: String, item: StructType, parent: Column): Seq[(String, Column)] =
      item.fields.flatMap { f =>
        f.dataType match {
          case av: StructType =>
            val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
            val avCol = parent.getField(f.name)
            val here =
              if (av.fieldNames.contains("N")) Seq(name -> avCol.getField("N"))
              else Nil
            val nested = av.fields.find(_.name == "M").map(_.dataType) match {
              case Some(m: StructType) => nPaths(name, m, avCol.getField("M"))
              case _ => Nil
            }
            here ++ nested
          case _ => Nil
        }
      }.toSeq
    val paths = nPaths("", itemType, col("Item"))
    val stats: Map[String, NStats] =
      if (paths.isEmpty) Map.empty
      else {
        val aggs = paths.zipWithIndex.flatMap { case ((_, c), i) => Seq(
          max(c.contains(".").cast("int")).as(s"f$i"),
          // integer digits, sign and leading zeros stripped
          max(length(regexp_replace(
            regexp_extract(c, "^-?(\\d+)", 1), "^0+", ""))).as(s"i$i"),
          max(length(regexp_extract(c, "\\.(\\d+)$", 1))).as(s"d$i"))
        }
        val row = avShaped.agg(aggs.head, aggs.tail: _*).head()
        paths.zipWithIndex.map { case ((name, _), i) =>
          def g(j: Int) = if (row.isNullAt(j)) 0 else row.getInt(j)
          name -> NStats(g(3 * i) == 1, g(3 * i + 1), g(3 * i + 2))
        }.toMap
      }
    def inferField(name: String, fname: String, av: StructType): StructField = {
      val tags = av.fieldNames.toSet
      def plain(dt: DataType) = StructField(fname, dt)
      if (tags.contains("S")) plain(StringType)
      else if (tags.contains("N"))
        plain(nType(stats.getOrElse(name, NStats(fractional = false, 1, 0))))
      else if (tags.contains("BOOL")) plain(BooleanType)
      else if (tags.contains("B")) plain(BinaryType)
      else if (tags.contains("SS")) plain(ArrayType(StringType))
      else if (tags.contains("NS")) plain(ArrayType(DoubleType))
      else if (tags.contains("BS")) plain(ArrayType(BinaryType))
      else if (tags.contains("M")) av.fields.find(_.name == "M").get.dataType match {
        case m: StructType =>
          plain(StructType(m.fields.map(f => inferField(
            s"$name.${f.name}", f.name, f.dataType.asInstanceOf[StructType]))))
        case _ => plain(MapType(StringType, StringType))
      }
      else if (tags.contains("L")) av.fields.find(_.name == "L").get.dataType match {
        // single-scalar-tag element type → typed array; anything mixed or
        // nested → JSON-encoded AttributeValue leaves (lossless, §7.5.2)
        case ArrayType(el: StructType, _) =>
          el.fieldNames.toSet match {
            case s if s == Set("S") => plain(ArrayType(StringType))
            case s if s == Set("N") => plain(ArrayType(DoubleType))
            case s if s == Set("BOOL") => plain(ArrayType(BooleanType))
            case _ => StructField(fname, ArrayType(StringType), nullable = true,
              metadata = HetMeta)
          }
        case _ => plain(ArrayType(StringType))
      }
      else if (tags.contains("NULL")) plain(StringType)
      else plain(StringType)
    }
    StructType(itemType.fields.map { f =>
      inferField(f.name, f.name, f.dataType.asInstanceOf[StructType])
    })
  }

  /** Widen/merge two schema generations — `glue:UpdateTable` +
    * `GetTableVersions` analog (reference src:113-115). New attributes
    * append; conflicting numeric types widen Long→Double; anything else
    * must match. */
  def mergeSchemas(a: StructType, b: StructType): StructType = {
    def widen(x: DataType, y: DataType): DataType = (x, y) match {
      case (s, t) if s == t => s
      case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      // decimal widening (38-digit `N` inference, SURVEY §7.5.1): target
      // scale/int-digits cover both sides, capped at precision 38 — two
      // maximal decimals (38,0)+(38,18) cap to (38,18), the documented
      // N-default (integer range beyond 10^20 then overflows to null)
      case (a: DecimalType, b: DecimalType) =>
        val scale = math.max(a.scale, b.scale)
        val intD = math.max(a.precision - a.scale, b.precision - b.scale)
        DecimalType(math.min(38, intD + scale), scale)
      case (d: DecimalType, LongType | IntegerType) => widen(d, DecimalType(19, 0))
      case (LongType | IntegerType, d: DecimalType) => widen(DecimalType(19, 0), d)
      case (_: DecimalType, DoubleType) | (DoubleType, _: DecimalType) =>
        DecimalType(38, 18)
      case (s: StructType, t: StructType) => mergeSchemas(s, t)
      case (ArrayType(s, _), ArrayType(t, _)) => ArrayType(widen(s, t))
      case (s, t) => throw new IllegalArgumentException(
        s"incompatible schema evolution: $s vs $t")
    }
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { f =>
      bByName.get(f.name)
        .map { g =>
          // a generation that ever saw mixed-type content stays heterogeneous
          if (isHet(f) || isHet(g))
            StructField(f.name, ArrayType(StringType), nullable = true,
              metadata = HetMeta)
          else StructField(f.name, widen(f.dataType, g.dataType),
            nullable = true, metadata = f.metadata)
        }
        .getOrElse(f.copy(nullable = true))
    }
    val extras = b.fields.filterNot(f => a.fieldNames.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extras)
  }
}
