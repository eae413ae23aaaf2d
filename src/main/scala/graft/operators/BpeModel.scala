package graft.operators

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Persisted BPE merge-table artifact — the tokenizer model as a real,
  * versioned on-disk object ([[IvfIndex]]'s build/save/load lifecycle
  * applied to the trainer, replacing the in-process merge cache as the
  * cross-job contract):
  *
  *  - `save` writes the merge table as parquet under a NEW `v=<n>`
  *    subdirectory — append-only, staged + atomically moved, so a crashed
  *    writer can never leave a partial version visible and concurrent
  *    readers always see a complete model;
  *  - `load` reads the LATEST version; `loadVersion` pins one — time
  *    travel over tokenizer models, the same inclusive-version contract
  *    as the log source's `versionAsOf`.
  *
  * Schema = `train_bpe`'s output, `(round, lhs, rhs, merged, pair_freq)`:
  * merge ORDER is the model (BPE applies merges in learned order), so
  * both `save` and `loadVersion` keep rows sorted by round. The table is
  * model-sized by construction (one row per learned merge — thousands at
  * a production vocab, never corpus-scale), so the load-side collect is
  * bounded by the same contract as IvfIndex's centroid read.
  */
object BpeModel {

  /** (round, lhs, rhs, merged, pair_freq) in learned order. */
  type Merges = Seq[(Long, String, String, String, Long)]

  /** All complete model versions under `dir`, ascending; empty if the
    * directory doesn't exist yet. */
  def versions(dir: String): Seq[Long] = VersionedArtifact.versions(dir)

  /** Persist `merges` as the next version under `dir`; returns the new
    * version number. Staged write + atomic rename: readers never observe
    * a half-written model, and two racing writers get distinct versions
    * (the JVM-level lock serializes the local case; cross-JVM races are
    * resolved by the rename failing on an existing target, retried with
    * the next number).
    *
    * `fingerprint` stamps the version with the identity of the corpus it
    * was trained from (written as a `_fingerprint` file INSIDE the staged
    * dir, so it commits atomically with the model and parquet readers —
    * which skip underscore files — never see it as data). A consumer
    * holding the current corpus fingerprint compares it against
    * [[fingerprintOf]] to detect a STALE artifact instead of silently
    * tokenizing with yesterday's merges — the staleness contract
    * BpeModelStalenessSpec pins. */
  def save(
      s: SparkSession, merges: Merges, dir: String,
      fingerprint: Option[String] = None): Long = {
    import s.implicits._
    val df = merges.toDF("round", "lhs", "rhs", "merged", "pair_freq")
      .orderBy("round")
    VersionedArtifact.save(dir, fingerprint)(staging =>
      df.coalesce(1).write.mode("overwrite").parquet(staging))
  }

  /** The corpus fingerprint version `version` was trained from, or None
    * for a version saved without one (pre-staleness-contract artifacts —
    * their staleness is UNKNOWN, which callers must treat as their own
    * policy decision, not as fresh). */
  def fingerprintOf(dir: String, version: Long): Option[String] =
    VersionedArtifact.fingerprintOf(dir, version)

  /** Load the latest version; throws if no model has been saved. */
  def load(s: SparkSession, dir: String): Merges = {
    val vs = versions(dir)
    require(vs.nonEmpty, s"no BPE model versions under $dir")
    loadVersion(s, dir, vs.last)
  }

  /** Load one pinned version (tokenizer-model time travel). */
  def loadVersion(s: SparkSession, dir: String, version: Long): Merges = {
    val path = s"$dir/v=$version"
    require(Files.isDirectory(Paths.get(path)),
      s"BPE model version $version does not exist under $dir")
    // model-sized by construction: one row per learned merge
    s.read.parquet(path)
      .select("round", "lhs", "rhs", "merged", "pair_freq")
      .orderBy("round")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq
  }
}
