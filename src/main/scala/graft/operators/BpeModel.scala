package graft.operators

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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

  private val VersionDir = "v=(\\d+)".r

  /** All complete model versions under `dir`, ascending; empty if the
    * directory doesn't exist yet. */
  def versions(dir: String): Seq[Long] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.list(root))(
      _.iterator().asScala.toList).collect {
      case p if Files.isDirectory(p) =>
        p.getFileName.toString match {
          case VersionDir(n) => Some(n.toLong)
          case _ => None
        }
    }.flatten.sorted
  }

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
      fingerprint: Option[String] = None): Long =
    synchronized {
      val root = Paths.get(dir)
      Files.createDirectories(root)
      import s.implicits._
      val df = merges.toDF("round", "lhs", "rhs", "merged", "pair_freq")
        .orderBy("round")
      var attempt = versions(dir).foldLeft(0L)(math.max) + 1
      var done = -1L
      while (done < 0) {
        val staging = root.resolve(
          s"staging-${java.util.UUID.randomUUID().toString.take(8)}")
        df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
        fingerprint.foreach(fp => Files.write(
          staging.resolve("_fingerprint"),
          fp.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        try {
          Files.move(staging, root.resolve(s"v=$attempt"),
            StandardCopyOption.ATOMIC_MOVE)
          done = attempt
        } catch {
          // a lost cross-JVM race surfaces as EEXIST when the target is a
          // file/empty dir, but on Linux as ENOTEMPTY
          // (DirectoryNotEmptyException) when renaming onto the winner's
          // populated v=N directory — both mean "taken, try the next"
          case _: java.nio.file.FileAlreadyExistsException |
              _: java.nio.file.DirectoryNotEmptyException =>
            deleteRecursively(staging)
            attempt += 1
        }
      }
      done
    }

  /** The corpus fingerprint version `version` was trained from, or None
    * for a version saved without one (pre-staleness-contract artifacts —
    * their staleness is UNKNOWN, which callers must treat as their own
    * policy decision, not as fresh). */
  def fingerprintOf(dir: String, version: Long): Option[String] = {
    val f = Paths.get(dir, s"v=$version", "_fingerprint")
    if (Files.isRegularFile(f))
      Some(new String(Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8))
    else None
  }

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

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(p))(
        _.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.toList).foreach(Files.deleteIfExists(_))
    }
}
