package graft

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.types._

import graft.etl.SnapshotLoad
import graft.sources.DdbExportReader
import graft.store.TableStore

/** On-disk export ingestion: plain + gzip files, inference, end-to-end
  * snapshot load (FIXTURES.md §3.1 export shape). */
class DdbExportReaderSpec extends SparkSuite {

  private val lines = Seq(
    """{"Item":{"PK":{"S":"A#1"},"SK":{"S":"X"},"qty":{"N":"3"},"price":{"N":"19.95"},"ok":{"BOOL":true}}}""",
    """{"Item":{"PK":{"S":"A#2"},"SK":{"S":"Y"},"qty":{"N":"5"},"price":{"N":"2.50"}}}""",
    """{"Item":{"PK":{"S":"B#1"},"SK":{"S":"Z"},"qty":{"N":"7"},"price":{"N":"0.99"},"note":{"S":"hi"}}}""")

  private def writePlain(): String = {
    val dir = Files.createTempDirectory("graft_export")
    Files.write(dir.resolve("part-000.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("reads and infers schema from a plain export directory") {
    val df = DdbExportReader.read(spark, writePlain())
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("PK") == StringType)
    assert(types("qty") == LongType)      // integer-only N
    assert(types("price") == DoubleType)  // fractional N
    assert(types("ok") == BooleanType)
    assert(df.count() == 3)
    // missing attributes surface as NULLs, not errors
    assert(df.filter("note IS NULL").count() == 2)
  }

  test("reads gzip-compressed exports transparently") {
    val dir = Files.createTempDirectory("graft_export_gz")
    val out = new GZIPOutputStream(
      Files.newOutputStream(dir.resolve("part-000.json.gz")))
    out.write(lines.mkString("\n").getBytes("UTF-8")); out.close()
    val df = DdbExportReader.read(spark, dir.toString)
    assert(df.count() == 3)
  }

  test("explicit target schema + key validation") {
    val target = StructType(Seq(
      StructField("PK", StringType), StructField("SK", StringType),
      StructField("qty", LongType)))
    val df = DdbExportReader.read(spark, writePlain(), Some(target),
      keyColumns = Seq("PK", "SK"))
    assert(df.schema.fieldNames.toSeq == Seq("PK", "SK", "qty"))
    val e = intercept[IllegalArgumentException](
      DdbExportReader.read(spark, writePlain(), Some(target),
        keyColumns = Seq("missing")))
    assert(e.getMessage.contains("key column"))
  }

  test("SnapshotLoad: export file -> partitioned committed snapshot") {
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_snapload").toString)
    val v = SnapshotLoad.run(spark, writePlain(), store,
      partitionBy = Seq("PK"), keyColumns = Seq("PK", "SK"))
    assert(v == 0L)
    val back = store.readSnapshot()
    assert(back.count() == 3)
    assert(back.filter("PK = 'A#1'").select("price").head().getDouble(0) == 19.95)
  }
}
