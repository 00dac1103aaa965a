package graft.oracle

/** DuckDB twins of the derived filesystem catalog
  * ([[graft.core.Tables.FsCatalog]]) and the reference views
  * (`FileDbDAL/SQLUtil.py:223-357`), as a reusable WITH-clause prefix.
  *
  * Every catalog-backed query in [[graft.SparkEntry.oracleSql]] is
  * `Oracle.cte + "SELECT ..."`, so the DuckDB oracle constructs the exact
  * same relations from the same driver-provided parquet tables as the
  * Spark side does. Portability constraints honored here:
  *   - DuckDB 1.x regex is RE2 → no lookbehind; we use the capture-group
  *     form of `basepath` on both engines.
  *   - DuckDB has no `sha1()` → the catalog's synthetic "sha1" values are
  *     md5 with a distinct salt on both engines.
  *   - regexp_replace replacement syntax differs (`\1` vs `$1`) but the
  *     produced strings are identical.
  *   - integer-ish columns are CAST to BIGINT to match Spark's LongType.
  */
object Oracle {

  val t0 = "TIMESTAMP '2024-01-01 00:00:00'"

  /** DuckDB `basepath(p)` expression (twin of
    * [[graft.functions.PathFunctions.basepath]]). */
  def basepathSql(p: String): String = {
    // (?s): '.' crosses newlines, matching the Java (?s)…\z twins and the
    // byte-scan fast expressions (RE2's '$' is already end-of-text)
    val stripped = s"regexp_replace($p, '(?s)(.)[/\\\\][^/\\\\]+$$', '\\1')"
    s"(CASE WHEN $stripped LIKE '%:' THEN $stripped || '\\' ELSE $stripped END)"
  }

  /** DuckDB `basename(p)` twin. */
  def basenameSql(p: String): String =
    s"regexp_replace($p, '(?s)^.+[/\\\\]', '')"

  /** DuckDB `extension(p)` twin (dotless name returned whole, lower-cased). */
  def extensionSql(p: String): String =
    s"lower(regexp_replace($p, '(?s)^.+\\.', ''))"

  private val hashKey =
    "o_orderpriority || '#' || CAST(CAST(floor(o_totalprice / 10000) AS INT) AS VARCHAR)"

  /** The full catalog prefix: `WITH directory AS (…), file AS (…), …`.
    * Column-for-column mirror of `Tables.FsCatalog` — keep in sync. */
  val cte: String = s"""WITH directory AS (
  SELECT CAST(100 + r_regionkey AS BIGINT) AS id, '/' || r_name AS dir_path,
         $t0 AS ctime, $t0 AS mtime, $t0 AS inserted_on, $t0 AS updated_on
  FROM region
  UNION ALL
  SELECT CAST(200 + n_nationkey AS BIGINT), '/' || r_name || '/' || n_name,
         $t0, $t0, $t0, $t0
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT CAST(300 + n_nationkey AS BIGINT), '/' || r_name || '/' || n_name || '/archive',
         $t0, $t0, $t0, $t0
  FROM nation JOIN region ON n_regionkey = r_regionkey
), file AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id,
         'order_' || CAST(o_orderkey AS VARCHAR) || '.' ||
           (CASE WHEN o_orderstatus = 'O' THEN 'txt'
                 WHEN o_orderstatus = 'F' THEN 'log' ELSE 'dat' END) AS name,
         CAST((CASE WHEN o_orderkey % 7 = 0 THEN 300 ELSE 200 END) + c_nationkey AS BIGINT) AS dir_id,
         CAST(floor(o_totalprice / 10000) AS DECIMAL(18,6)) AS size,
         o_orderdate AS ctime, o_orderdate AS mtime, CAST(NULL AS TIMESTAMP) AS atime,
         $t0 AS inserted_on, $t0 AS updated_on
  FROM orders JOIN customer ON o_custkey = c_custkey
), hash AS (
  SELECT CAST(o_orderkey AS BIGINT) AS id, CAST(o_orderkey AS BIGINT) AS file_id,
         md5($hashKey) AS md5_hash, $t0 AS md5_hash_time,
         md5('sha1|' || $hashKey) AS sha1_hash, $t0 AS sha1_hash_time
  FROM orders WHERE o_orderkey % 3 <> 0
), file_category AS (
  SELECT * FROM (VALUES ('txt', 'document'), ('log', 'logfile'),
                        ('dat', 'data'), ('jpg', 'image')) AS t(extension, category)
), directory_control AS (
  SELECT dir_path, id AS dir_id,
         CAST((id * 13) % 250 AS INT) AS file_count,
         CAST((id * 7) % 40 AS INT) AS subdir_count,
         $t0 + CAST(id % 8760 AS BIGINT) * INTERVAL 1 HOUR AS next_crawl,
         CAST(900 + (id % 168) * 3600 AS INT) AS crawl_frequency,
         CAST(NULL AS INT) AS assigned_process_id,
         CASE WHEN id % 11 = 0 THEN $t0 ELSE CAST(NULL AS TIMESTAMP) END AS process_assigned_on,
         $t0 AS last_crawled, CAST(NULL AS TIMESTAMP) AS last_active,
         (id % 13 = 0) AS dir_missing, $t0 AS inserted_on
  FROM directory
), hash_control AS (
  SELECT id AS file_id, mtime, size AS file_size,
         CAST(NULL AS TIMESTAMP) AS process_assigned_on,
         false AS file_missing, $t0 AS inserted_on
  FROM file WHERE id % 5 = 0
), vw_ll AS (
  -- view `size` is DOUBLE on both engines (exact for these magnitudes);
  -- the base `file.size` stays DECIMAL for order-independent SUMs
  SELECT 'file' AS type, d.dir_path || '/' || f.name AS full_path,
         f.id AS file_id, f.name, f.dir_id, CAST(f.size AS DOUBLE) AS size,
         f.ctime, f.mtime, f.atime,
         h.md5_hash, h.sha1_hash, d.dir_path
  FROM file f
  JOIN directory d ON d.id = f.dir_id
  LEFT JOIN hash h ON h.file_id = f.id
  UNION ALL
  SELECT 'dir', c.dir_path, CAST(0 AS BIGINT), ${basenameSql("c.dir_path")},
         p.id, CAST(0 AS DOUBLE), c.ctime, c.mtime,
         CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         p.dir_path
  FROM directory c
  JOIN directory p ON p.dir_path = ${basepathSql("c.dir_path")}
), vw_file_detail AS (
  SELECT d.dir_path || '/' || f.name AS full_path,
         f.id, f.name, f.dir_id, CAST(f.size AS DOUBLE) AS size,
         f.ctime, f.mtime, f.atime,
         h.md5_hash, h.sha1_hash, d.dir_path, fc.category
  FROM file f
  JOIN directory d ON d.id = f.dir_id
  LEFT JOIN hash h ON h.file_id = f.id
  LEFT JOIN file_category fc ON fc.extension = ${extensionSql("f.name")}
)
"""
}
