package graft

import org.apache.spark.sql.SparkSession

/** The engine's standard local-session configuration, in ONE place —
  * Bench, ScalingBench, Verify, Explain and RunOne all build from
  * here, so a perf conf added for one harness cannot silently drift
  * out of the others (the repo already retrofitted
  * `objectHashAggregate.sortBased.fallbackThreshold` into every
  * builder by hand once). The settings are the BENCH.md §0/§3
  * hygiene set:
  *
  *  - `shuffle.partitions` = the worker-thread count (not 200)
  *  - 256-row columnar reader batches (binary-payload tables OOM the
  *    4096-row default on ~60 KB blobs)
  *  - ObjectHashAggregate fallback threshold 65536 (ANN top-k: keep
  *    thousands of query_id groups on the hash partial path)
  *  - `InferFiltersFromGenerate` excluded engine-wide (13× on the
  *    shingle explodes)
  *  - UTC session time zone, AQE on, no UI
  */
object GraftSession {

  def builder(master: String, partitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "256")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      .config("spark.sql.streaming.checkpointFileManagerClass",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_MANAGER",
          "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager"))
      // local `file:` scheme without the Shell-fork chmod fallback and
      // without `.crc` shadow files (see NioLocalFileSystem scaladoc);
      // HDFS/object-store deployments override or simply never touch
      // `file:` paths
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS",
          "graft.hadoop.NioLocalFileSystem"))
      // shuffle/block scratch follows java.io.tmpdir (build.sbt points
      // both at tmpfs when available; SPARK_GRAFT_TMPDIR overrides) —
      // Spark's own default is the literal "/tmp", which ignores the
      // JVM's tmpdir setting
      .config("spark.local.dir", sys.props("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
}
