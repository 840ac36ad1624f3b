package graft.catalog

/** Backup-metadata catalog domain model.
  *
  * Mirrors the reference's 3-table relational schema
  * (/root/reference/lib/hbacker/mysql.rb:28-102): one row per
  * export/import run (sessions), one row per table moved in a run
  * (table records), one row per (session, table, column) schema entry
  * (column descriptors). Field names are snake_case so the Dataset
  * column names line up 1:1 with the SQL the catalog queries emit.
  *
  * Times are epoch milliseconds (`Long`), exactly as the reference
  * stores them (mysql.rb:35-36,57-58); `0L` is the "not yet ended"
  * sentinel (mysql.rb:38, db.rb.old:325) — kept instead of null for
  * oracle determinism (SURVEY.md §7.4).
  */
final case class BackupSession(
    mode: String,            // "export" | "import"     (mysql.rb:31)
    cluster_name: String,    // source/target cluster   (mysql.rb:32)
    session_name: String,    // e.g. "20240101_000000"  (mysql.rb:33)
    dest_root: String,       // scheme://root/          (mysql.rb:34)
    specified_start: Long,   // requested window lo, ms (mysql.rb:35)
    specified_end: Long,     // requested window hi, ms (mysql.rb:36)
    started_at: Long,        // ms                      (mysql.rb:37)
    ended_at: Long,          // ms; 0 = not ended       (mysql.rb:38)
    error: Boolean,          //                         (mysql.rb:39)
    error_info: String       //                         (mysql.rb:40)
)

/** One row per table per session (mysql.rb:51-73). `row_count` is the
  * integrity metric the reference lists as future work
  * (/root/reference/README.textile:189-191) — first-class here.
  */
final case class TableRecord(
    mode: String,
    table_name: String,
    session_name: String,
    start_time: Long,          // actual window lo, ms (mysql.rb:57)
    end_time: Long,            // actual window hi, ms (mysql.rb:58)
    specified_versions: Long,  // version cap          (mysql.rb:59)
    empty: Boolean,            // no rows → no data written (mysql.rb:60)
    error: Boolean,
    error_info: String,
    row_count: Long            // [EXT] rows moved; -1 = unknown
)

/** One row per (session, table, column). The reference stores HBase
  * column-family attributes (mysql.rb:75-102); our payload is Parquet,
  * so `name`/`data_type`/`nullable` carry the real schema and the
  * HBase-ish tuning attrs ride along for reference parity
  * (whitelist in mysql.rb:333 / stargate.rb:36-44).
  */
final case class ColumnDescriptor(
    session_name: String,
    table_name: String,
    ordinal: Int,        // column position — schema order must survive
                         // the round-trip (parquet read order is not it)
    name: String,
    data_type: String,   // Catalyst simpleString, e.g. "bigint"
    nullable: Boolean,
    max_versions: Int,
    compression: String,
    in_memory: Boolean,
    block_cache: Boolean,
    ttl: Long,
    blocksize: Long,
    bloomfilter: String,
    n_nulls: Long = -1L  // [EXT] nulls in the column as EXPORTED
                         // (measured post-write, same scan as the
                         // row_count integrity metric); -1 = unknown.
                         // What lets a json restore distinguish a
                         // null-omitted column from a lost one.
)

/** [EXT] A session-purge FACT — the takedown path on the metadata
  * plane (the tombstone discipline every EXT store gained: facts
  * append, reads anti-join, compaction drops rows physically). The
  * reference's catalog can only accrete; a real backup catalog must
  * also be able to FORGET a session (compliance takedown, a
  * poisoned-run scrub) without rewriting history in place.
  */
final case class PurgeRecord(
    mode: String,         // which plane's session ("export" | "import")
    session_name: String,
    purged_at: Long       // ms — audit trail, not a filter key
)

object ColumnDescriptor {
  /** Attribute whitelist, as the reference's AVAILABLE_OPTS filter
    * (mysql.rb:324-337, stargate.rb:36-44).
    */
  val AvailableOpts: Seq[String] = Seq(
    "name", "max_versions", "compression", "in_memory",
    "block_cache", "ttl", "blocksize", "bloomfilter")
}
