package graft.operators

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Persisted OPQ rotation — the learned orthogonal matrix as a real,
  * versioned on-disk artifact (the [[BpeModel]] lifecycle applied to
  * [[OpqRotation]], replacing the in-process fit memo as the cross-job
  * contract).
  *
  * Why this must be persisted and not merely memoized: a [[PqIndex]]
  * built over a rotated corpus stores ROTATED vectors and residual codes
  * — its probes are only correct against queries rotated by the SAME R.
  * An in-process memo makes that index unservable by a new process
  * without refitting, and a refit after the corpus GREW produces a
  * DIFFERENT (equally deterministic) R than the one the persisted codes
  * were encoded under — silently mis-rotating every probe. The artifact
  * closes both holes: R is saved next to a corpus fingerprint, loaded by
  * any process, and superseded (a NEW version) when the fingerprint no
  * longer matches — while every index encoded under an old R keeps its
  * own copy pinned inside the index dir ([[PqIndex.save]] writes
  * `<indexdir>/rotation`, so the SERVING R travels with the codes it
  * encoded and never depends on this model root at probe time).
  *
  * Schema: one row per matrix row, `(row INT, vals ARRAY<DOUBLE>)` —
  * model-sized by construction (d² doubles, 32 KB at d = 64), so the
  * load-side collect is bounded by the same contract as the centroid
  * reads. */
object OpqModel {

  /** All complete rotation versions under `dir`, ascending. */
  def versions(dir: String): Seq[Long] = VersionedArtifact.versions(dir)

  /** The corpus fingerprint `version` was fit from (None for artifacts
    * saved without one — staleness unknown). */
  def fingerprintOf(dir: String, version: Long): Option[String] =
    VersionedArtifact.fingerprintOf(dir, version)

  /** Persist a fitted rotation (flat row-major d×d) as the next version
    * under `dir`; returns the new version number. Staged + atomic — the
    * [[VersionedArtifact]] contract. */
  def save(
      s: SparkSession, r: Array[Double], dir: String,
      fingerprint: Option[String] = None): Long =
    VersionedArtifact.save(dir, fingerprint)(staging =>
      writeMatrix(s, r, staging))

  /** Write a flat row-major square matrix as the `(row, vals)` relation
    * [[readMatrix]] reads — shared by the versioned artifact and the
    * index-dir copy ([[PqIndex.save]]'s `<indexdir>/rotation`). */
  private[operators] def writeMatrix(
      s: SparkSession, r: Array[Double], path: String): Unit = {
    val d = math.sqrt(r.length.toDouble).toInt
    require(d * d == r.length, s"rotation length ${r.length} is not square")
    import s.implicits._
    (0 until d)
      .map(i => (i, r.slice(i * d, (i + 1) * d).toSeq))
      .toDF("row", "vals").orderBy("row")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load the latest version; throws if none saved. */
  def load(s: SparkSession, dir: String): Array[Double] = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no OPQ rotation versions under $dir")
    loadVersion(s, dir, vs.last)
  }

  /** Load one pinned version (rotation time travel — the version an
    * existing index was encoded under stays loadable after supersedes). */
  def loadVersion(s: SparkSession, dir: String, version: Long): Array[Double] = {
    val path = s"$dir/v=$version"
    require(Files.isDirectory(Paths.get(path)),
      s"OPQ rotation version $version does not exist under $dir")
    readMatrix(s, path)
  }

  /** Read a rotation relation written by [[save]] (or carried inside an
    * index dir) back to the flat row-major form the kernels take. */
  private[operators] def readMatrix(s: SparkSession, path: String): Array[Double] = {
    val rows = s.read.parquet(path)
      .select("row", "vals").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val d = rows.length
    val out = new Array[Double](d * d)
    rows.foreach { case (i, v) =>
      require(v.length == d, s"rotation row $i has ${v.length} cols, want $d")
      System.arraycopy(v, 0, out, i * d, d)
    }
    out
  }

  /** The STALENESS-SUPERSEDE entry point: return the latest version's
    * rotation when its stamped fingerprint equals `fingerprint`
    * (fresh), else fit via `fit` and save it as the next version
    * (supersede — a grown/changed corpus at the same keyed root gets a
    * new R, and indexes encoded under the old R keep probing correctly
    * through their own pinned copy). A latest version WITHOUT a stamp
    * is treated as stale (unknown ≠ fresh). Returns (rotation, version). */
  def ensure(
      s: SparkSession, dir: String, fingerprint: String)(
      fit: => Array[Double]): (Array[Double], Long) = synchronized {
    versions(dir).lastOption match {
      case Some(v) if fingerprintOf(dir, v).contains(fingerprint) =>
        (loadVersion(s, dir, v), v)
      case _ =>
        val r = fit
        val v = save(s, r, dir, Some(fingerprint))
        (r, v)
    }
  }
}
