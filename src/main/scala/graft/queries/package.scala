package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query modules. Each module exposes
  *   - `queries`: name -> (SparkSession, sfDir) => DataFrame  (the Spark plan)
  *   - `oracles`: name -> ANSI SQL runnable by DuckDB on the same parquet tables
  *
  * Conventions shared by every query (so the driver's hash-compare is stable):
  *   - every output is deterministically ordered (explicit orderBy with a
  *     unique tie-break key) and every computed double is rounded (2 or 4 dp)
  *     so cross-engine float summation order can't flip a hash;
  *   - column names are identical between the Spark plan and the oracle SQL;
  *   - integer-kind outputs are pinned to BIGINT on both sides (DuckDB widens
  *     `sum(int)`/`length()` differently from Spark);
  *   - timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings (events.ts is
  *     nanosecond-precision parquet: Spark truncates to micros, DuckDB keeps
  *     nanos — raw timestamp output would hash-mismatch).
  */
package object queries {
  type Q = (SparkSession, String) => DataFrame

  /** Unique per-invocation standing-state directory with cleanup-after-pin
    * (q300's r16 pattern, made the shared idiom in r17): build the query's
    * final frame against a fresh `Files.createTempDirectory` path, PIN the
    * output with an eager localCheckpoint (until then the frame lazily
    * reads the state files), then delete the directory. The previous fixed
    * hashCode-keyed tmp paths raced concurrent runs against the same sfDir
    * on build/append/merged and leaked state across runs. */
  private[queries] def withStateDir(prefix: String)(f: String => DataFrame): DataFrame = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    try f(p.toAbsolutePath.toString).localCheckpoint(eager = true)
    finally org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
  }
}
