package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Last-writer-wins CDC merge — the data-plane core of the reference's
  * continuous half (`AWS::Glue::Integration`, reference
  * src/dynamodb-zero-etl-s3tables.ts:211-215; "Data flows automatically",
  * README.md:12).
  *
  * A change batch carries INSERT/MODIFY/REMOVE records with a per-key total
  * order (`seqCol`, the stream sequence number — SURVEY §7.5.3). Applying a
  * batch onto a base snapshot:
  *
  *   - the record with the highest `seqCol` per key wins (LWW),
  *   - base rows rank below every change (sequence -1),
  *   - a winning REMOVE is a tombstone: the key disappears,
  *   - re-applying the same batch is a no-op (idempotent, mirroring the
  *     reference Lambda's remove-then-merge Sid reconciliation,
  *     lambda/catalog-policy-handler.js:52-61).
  *
  * Scale: one hash shuffle on the key columns + a per-key window; with AQE
  * the skewed-key case splits automatically. No driver-side state.
  */
object CdcApply {

  val OpInsert = "INSERT"
  val OpModify = "MODIFY"
  val OpRemove = "REMOVE"

  /** Apply `changes` onto `base`. `changes` must carry the key columns plus
    * `seqCol`/`opCol`; payload columns are reconciled by name in BOTH
    * directions, because the source is schemaless (mid-stream schema
    * evolution — the `glue:UpdateTable`/`GetTableVersions` analog, reference
    * src/dynamodb-zero-etl-s3tables.ts:113-115):
    *   - a change attribute the base has never seen WIDENS the result schema
    *     (appended column; base rows read NULL),
    *   - a base column absent from a change batch decodes as NULL in the
    *     change rows (absent attribute on a full-image record = NULL),
    *   - a shared column whose TYPE differs (a DynamoDB `N` that outgrew
    *     long into decimal mid-stream) widens BOTH sides to the
    *     [[graft.model.DdbAttr.mergeSchemas]] type — the other half of
    *     `glue:UpdateTable`, VERDICT r4 #5. */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    require(keys.nonEmpty, "CDC merge requires at least one key column")
    val missing = keys.filterNot(changes.columns.contains)
    require(missing.isEmpty, s"change batch is missing key columns: $missing")

    val changePayload = changes.columns.filterNot(c => c == seqCol || c == opCol)
    // shared columns whose types differ widen both sides to the merged type
    val retyped = changePayload.filter(base.columns.contains).flatMap { c =>
      val bt = base.schema(c).dataType
      val ct = changes.schema(c).dataType
      if (bt == ct) None
      else Some(c -> graft.model.DdbAttr.mergeSchemas(
        StructType(Seq(base.schema(c))),
        StructType(Seq(changes.schema(c)))).head.dataType)
    }.toMap
    val base0 = retyped.foldLeft(base) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t))
    }
    val changes0 = retyped.foldLeft(changes) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t))
    }
    val newCols = changePayload.filterNot(base0.columns.contains).toSeq
    val payload = base0.columns.toSeq ++ newCols
    val baseWide = newCols.foldLeft(base0) { (df, c) =>
      df.withColumn(c, lit(null).cast(changes0.schema(c).dataType))
    }
    val changesWide = payload.filterNot(changes0.columns.contains)
      .foldLeft(changes0) { (df, c) =>
        df.withColumn(c, lit(null).cast(base0.schema(c).dataType))
      }
    val baseTagged = baseWide
      .withColumn(seqCol, lit(-1L))
      .withColumn(opCol, lit(OpInsert))
    val all = baseTagged.select((payload ++ Seq(seqCol, opCol)).map(col): _*)
      .unionByName(changesWide.select(
        (payload ++ Seq(seqCol, opCol)).map(col): _*))

    // Deterministic LWW total order: seq desc, then op priority
    // (REMOVE > MODIFY > INSERT — a tombstone wins a replayed tie, the
    // conservative choice), then payload hash — so duplicate (key, seq)
    // records from a replayed/merged stream always pick the same winner.
    val opRank = when(col(opCol) === OpRemove, 0)
      .when(col(opCol) === OpModify, 1)
      .otherwise(2)
    val payloadHash = xxhash64(payload.map(c => col(c).cast("string")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, opRank.asc, payloadHash.asc)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= OpRemove)
      .select(payload.map(col): _*)
  }

  /** Deterministic change-batch column template for fixtures/tests. */
  def changeCols(op: Column, seq: Column, payload: Seq[Column]): Seq[Column] =
    payload ++ Seq(seq.as("seq"), op.as("op"))
}
