package graft.store

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.VecKernels

/** Persisted IVF ANN index (VERDICT r11 next #2) — the serving path the
  * in-query IVF variants (`sim_search_ivf*`, graft.ops.LlmSim) cannot be at
  * 100 TB: those re-train centroids and re-assign the whole corpus on EVERY
  * query; this one materializes the cell assignment ONCE as an index table
  * under `<base-root>/index/<name>` bucketed by cell id, with the trained
  * centroids frozen in the table props, and maintains it incrementally on
  * the changelog cadence exactly like a GSI. A point top-k then reads only
  * the `nProbe` probed cells' buckets — O(corpus/cells × nProbe) I/O,
  * sublinear in the corpus — instead of scanning and re-clustering
  * everything.
  *
  * Semantics notes:
  *  - Centroids are trained at CREATE and never retrained by refresh (the
  *    standard IVF practice — FAISS's `IndexIVF` keeps its quantizer fixed
  *    and `add()`s into existing cells): refresh assigns changed vectors to
  *    the frozen cells, so maintenance is O(changed rows + touched cell
  *    buckets) and never re-shuffles the index. An explicit drop+create
  *    retrains when the distribution drifts enough to matter.
  *  - The index IS a [[SecondaryIndex]] whose key (`cell`) is DERIVED from
  *    the vector column: create/refresh reuse the GSI machinery through its
  *    `project` hook (netting, touched-bucket routing, content-preserving
  *    fast path, snapshot pins all inherited), and the blanket
  *    maintenance-cadence call sites route here via the kind prop.
  *  - The stored embedding is the ORIGINAL vector (not normalized), so
  *    index-served cosine scores are bit-identical to a brute-force scan
  *    over the base table. */
object AnnIndex {

  /** Marks an index store as ANN so generic GSI paths (the blanket cadence
    * refresh) route through [[refresh]] instead of projecting a derived
    * column off base rows. */
  private[graft] val KindProp = "graft.index.kind"
  private[graft] val KindAnn = "ann-ivf"
  private val CentroidsProp = "graft.ann.centroids"
  private val VecColProp = "graft.ann.vec-col"
  /** cell→bucket map ("c:b,…"), computed ONCE at create with the engine's
    * own bucket expression and frozen with the centroids — point queries
    * resolve probed cells to bucket ids from metadata, zero plan-time
    * jobs. */
  private val CellBucketsProp = "graft.ann.cell-buckets"

  // ------------------------------------------------------------- training

  /** Spherical k-means over unit vectors, Lloyd iterations as map-side
    * partial sums (moved here from graft.ops.LlmSim, which delegates):
    * centroids seed deterministically from the `clusters` lowest ids; each
    * iteration is ONE distributed pass producing per-partition (cluster,
    * count, sum-vector) partials, so driver traffic is O(partitions ×
    * clusters × dim) per iteration — independent of corpus size. Empty
    * clusters keep their previous centroid. */
  def kmeansCentroids(unit: Dataset[(Long, Array[Double])],
      clusters: Int, iters: Int): Array[Array[Double]] = {
    import unit.sparkSession.implicits._
    val sc = unit.sparkSession.sparkContext
    var cents: Array[Array[Double]] = unit
      .orderBy(col("_1").asc).limit(clusters)
      .collect().sortBy(_._1).map(_._2)
    require(cents.nonEmpty, "kmeans needs at least one seed vector")
    for (_ <- 1 to iters) {
      val bc = sc.broadcast(cents)
      val partials = unit.mapPartitions { it =>
        val cs = bc.value
        val dim = cs(0).length
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val cnts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val c = VecKernels.nearestCentroid(v, cs)
          cnts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        cnts.indices.iterator.filter(cnts(_) > 0)
          .map(c => (c, cnts(c), sums(c)))
      }.collect() // ≤ partitions × clusters rows of dim doubles — metadata-sized
      val dim = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val cnts = new Array[Long](cents.length)
      partials.foreach { case (c, n, s) =>
        cnts(c) += n
        var i = 0
        while (i < dim) { sums(c)(i) += s(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (cnts(c) == 0) cents(c)
        else {
          val mean = sums(c).map(_ / cnts(c))
          val norm = math.sqrt(VecKernels.dotD(mean, mean))
          if (norm > 0) mean.map(_ / norm) else cents(c)
        }
      }.toArray
      bc.destroy()
    }
    cents
  }

  // --------------------------------------------------- centroid (de)ser

  private def centsToJson(cents: Array[Array[Double]]): String =
    cents.map(_.map(d => java.lang.Double.toString(d))
      .mkString("[", ",", "]")).mkString("[", ",", "]")

  private[graft] def centsFromJson(s: String): Array[Array[Double]] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    JsonMethods.parse(s).extract[Seq[Seq[Double]]].map(_.toArray).toArray
  }

  // --------------------------------------------------------- assignment

  /** (cell, id, vec) rows: each vector normalized and assigned to its
    * nearest frozen centroid — one map-side JIT'd pass, no shuffle. */
  private def assignCells(rows: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame = {
    import rows.sparkSession.implicits._
    val bc = rows.sparkSession.sparkContext.broadcast(cents)
    rows.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) =>
          (VecKernels.nearestCentroid(VecKernels.normalize(v), cs), id, v)
        }
      }.toDF("cell", idCol, vecCol)
  }

  private def idColOf(im: TableStore.Manifest): String = {
    val vecCol = im.props(VecColProp)
    im.schema.fieldNames
      .filterNot(Set("cell", vecCol, "_gbucket")).head
  }

  // -------------------------------------------------------------- create

  /** Train `clusters` centroids on the current base snapshot and
    * materialize the cell-bucketed index in ONE O(base) pass — the only
    * full pass the index ever costs. `numBuckets` defaults to `clusters`
    * so a probed cell maps to ~one bucket file set. */
  def create(base: TableStore, name: String, vecCol: String,
      clusters: Int = 16, iters: Int = 4, numBuckets: Int = -1): Long = {
    import base.spark.implicits._
    require(TableStore.RefNameOk.pattern.matcher(name).matches(),
      s"index name must match [A-Za-z0-9._-]{1,128}, got '$name'")
    val bv = base.currentVersion()
    require(bv >= 0, "cannot index an empty table")
    val bm = base.manifest(bv)
    require(bm.bucketKeys.size == 1 &&
        bm.schema(bm.bucketKeys.head).dataType ==
          org.apache.spark.sql.types.LongType,
      s"the ANN index keys vectors by a single LONG primary key; " +
        s"base has ${bm.bucketKeys}")
    val idCol = bm.bucketKeys.head
    require(bm.schema.fieldNames.contains(vecCol),
      s"vector column '$vecCol' not in base schema")
    val idx = SecondaryIndex.indexStore(base, name)
    require(idx.currentVersion() < 0, s"index '$name' already exists")
    val corpus = base.readSnapshot(bv).select(col(idCol), col(vecCol))
    val unit = corpus.as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, VecKernels.normalize(v)) })
    val cents = kmeansCentroids(unit, clusters, iters)
    val nb = if (numBuckets > 0) numBuckets else clusters
    // one clusters-row local job resolves every cell's bucket id through
    // the engine's own bucket expression; frozen in props so point
    // queries never pay a plan-time job for it
    val cellBuckets = cents.indices.toDF("cell")
      .select(col("cell"), TableStore.bucketExpr(Seq("cell"), nb).as("b"))
      .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(",")
    idx.commitBucketed(assignCells(corpus, idCol, vecCol, cents),
      Seq("cell"), nb,
      props = Map(
        SecondaryIndex.BaseVersionProp -> bv.toString,
        SecondaryIndex.IndexKeysProp -> "cell",
        KindProp -> KindAnn,
        VecColProp -> vecCol,
        CentroidsProp -> centsToJson(cents),
        CellBucketsProp -> cellBuckets))
    SecondaryIndex.movePin(base, name, bv)
    bv
  }

  // ------------------------------------------------------------- refresh

  /** Advance the index to the base head on the frozen centroids: the GSI
    * replay with cell derivation as the projection — O(changed rows +
    * touched cell buckets), broad churn routed to the one-pass clustered
    * rebuild (same centroids — a rebuild re-ASSIGNS, never re-trains). */
  def refresh(base: TableStore, name: String): Long = {
    val idx = SecondaryIndex.indexStore(base, name)
    val iv = idx.currentVersion()
    require(iv >= 0, s"ANN index '$name' does not exist; create it first")
    val im = idx.manifest(iv)
    require(im.props.get(KindProp).contains(KindAnn),
      s"'$name' is not an ANN index")
    val cents = centsFromJson(im.props(CentroidsProp))
    val vecCol = im.props(VecColProp)
    val idCol = idColOf(im)
    SecondaryIndex.refresh(base, name, allowRebuild = true,
      project = Some(df => assignCells(df, idCol, vecCol, cents)))
  }

  // -------------------------------------------------------------- query

  /** Point top-k: probe the `nProbe` cells nearest the query (a driver-side
    * argsort over the frozen centroids — metadata-sized), read ONLY those
    * cells' index buckets, score map-side, TakeOrdered. Never touches the
    * base table and never reads an unprobed bucket — the plan a 100 TB
    * point query needs. Returns (idCol, cos_sim) rounded to 6 dp with id
    * tie-break, the same surface as the in-query ANN entries. */
  def topk(base: TableStore, name: String, queryVec: Array[Float], k: Int,
      nProbe: Int = 2, excludeId: Option[Long] = None): DataFrame = {
    val s = base.spark
    import s.implicits._
    val idx = SecondaryIndex.indexStore(base, name)
    val iv = idx.currentVersion()
    require(iv >= 0, s"ANN index '$name' does not exist")
    val im = idx.manifest(iv)
    require(im.props.get(KindProp).contains(KindAnn),
      s"'$name' is not an ANN index")
    val cents = centsFromJson(im.props(CentroidsProp))
    val vecCol = im.props(VecColProp)
    val idCol = idColOf(im)
    val q = VecKernels.normalize(queryVec)
    val cells = cents.indices
      .sortBy(c => (-VecKernels.dotD(q, cents(c)), c)).take(nProbe)
    // probed cells → bucket ids from the frozen metadata map (computed at
    // create through the engine's own bucket expression; a local job only
    // as back-compat fallback), then a bucket-targeted read: the file set
    // is a strict subset by construction, independent of filter pushdown
    val bids = im.props.get(CellBucketsProp) match {
      case Some(m) =>
        val byCell = m.split(',').map { e =>
          val Array(c, b) = e.split(':'); c.toInt -> b.toLong
        }.toMap
        cells.map(byCell).distinct.sorted
      case None =>
        cells.toDF("cell")
          .select(TableStore.bucketExpr(Seq("cell"), im.numBuckets).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq.sorted
    }
    val entries = idx.readBuckets(bids, iv)
      .filter(col("cell").isin(cells.map(Int.box): _*))
    val kept = excludeId match {
      case Some(id) => entries.filter(col(idCol) =!= id)
      case None => entries
    }
    val qv = queryVec
    kept.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, VecKernels.cosine(v, qv)) })
      .toDF(idCol, "cos_raw")
      .select(col(idCol), round(col("cos_raw"), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc_nulls_last, col(idCol).asc_nulls_first)
      .limit(k)
  }

  /** [[topk]] with the query vector fetched by primary key — one
    * bucket-pruned point read of the base table, never a corpus scan. */
  def topkById(base: TableStore, name: String, queryId: Long, k: Int,
      nProbe: Int = 2): DataFrame = {
    val idx = SecondaryIndex.indexStore(base, name)
    val im = idx.manifest(idx.currentVersion())
    val vecCol = im.props(VecColProp)
    val idCol = idColOf(im)
    val qRows = base.readSnapshot().filter(col(idCol) === queryId)
      .select(col(vecCol)).limit(2).collect()
    require(qRows.length == 1, s"query id $queryId not unique in base")
    val qv = qRows.head.getSeq[Float](0).toArray
    topk(base, name, qv, k, nProbe, excludeId = Some(queryId))
  }
}
