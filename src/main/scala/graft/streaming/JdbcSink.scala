package graft.streaming

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S3: the reference's JDBC DML sink (main.go:128-135) — op-specific
  * INSERT/UPDATE/DELETE executed against a JDBC target, here demonstrated
  * for real against embedded Derby (on the Spark classpath).
  *
  * Semantics carried over:
  *   - op-specific statement per change event (P6's four projections
  *     collapse to parameterized statements — P7: no SQL-literal escaping
  *     needed at all, main.go:336's quote-stripping becomes moot);
  *   - duplicate-key INSERT is silently skipped (F8, main.go:138-141) —
  *     at-least-once redelivery is absorbed by the sink;
  *   - UPDATE of a missing row falls back to INSERT (idempotent upsert, the
  *     strictly-stronger form of the reference's blind UPDATE).
  *
  * Scale design: repartition by pk so each key's events land in ONE
  * partition, sortWithinPartitions by binlog (file, pos, row) so they apply
  * in order (ST3) — per-key ordering holds on any number of executors, one
  * connection per partition (the reference opens one global connection and
  * applies 1 event per round-trip, main.go:63-169).
  */
object JdbcSink {

  /** Apply a batch of parsed changes (schema of CdcStreaming.parseBatch's
    * `valid` output) to `table` at `url`. Columns written: id, name, amount.
    */
  def applyChanges(valid: DataFrame, url: String, table: String): Unit = {
    val projected = valid.select(
      col("id"),
      element_at(col("after"), "name").as("name"),
      element_at(col("after"), "amount").cast("long").as("amount"),
      col("op"), col("file"), col("pos"), col("row"))
    projected
      .repartition(col("id"))
      .sortWithinPartitions(col("file"), col("pos"), col("row"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn = DriverManager.getConnection(url)
          try rows.foreach(r => applyOne(conn, table, r))
          finally conn.close()
        }
      }
  }

  private def applyOne(conn: Connection, table: String,
      r: org.apache.spark.sql.Row): Unit = {
    val id = r.getLong(r.fieldIndex("id"))
    r.getString(r.fieldIndex("op")) match {
      case "D" =>
        val st = conn.prepareStatement(s"DELETE FROM $table WHERE id = ?")
        try { st.setLong(1, id); st.executeUpdate() } finally st.close()
      case "I" =>
        try insert(conn, table, r, id)
        catch {
          // F8: duplicate-entry redelivery is skipped, not fatal
          case _: java.sql.SQLIntegrityConstraintViolationException => ()
        }
      case _ => // "U"
        val st = conn.prepareStatement(
          s"UPDATE $table SET name = ?, amount = ? WHERE id = ?")
        try {
          setName(st, 1, r)
          setAmount(st, 2, r)
          st.setLong(3, id)
          if (st.executeUpdate() == 0) insert(conn, table, r, id)
        } finally st.close()
    }
  }

  private def setName(st: java.sql.PreparedStatement, pos: Int,
      r: org.apache.spark.sql.Row): Unit = {
    val i = r.fieldIndex("name")
    if (r.isNullAt(i)) st.setNull(pos, java.sql.Types.VARCHAR)
    else st.setString(pos, r.getString(i))
  }

  private def setAmount(st: java.sql.PreparedStatement, pos: Int,
      r: org.apache.spark.sql.Row): Unit = {
    val i = r.fieldIndex("amount")
    if (r.isNullAt(i)) st.setNull(pos, java.sql.Types.BIGINT)
    else st.setLong(pos, r.getLong(i))
  }

  private def insert(conn: Connection, table: String,
      r: org.apache.spark.sql.Row, id: Long): Unit = {
    val st = conn.prepareStatement(
      s"INSERT INTO $table (id, name, amount) VALUES (?, ?, ?)")
    try {
      st.setLong(1, id)
      setName(st, 2, r)
      setAmount(st, 3, r)
      st.executeUpdate()
    } finally st.close()
  }

  // ------------------------------------------------------------ SCD2 sink
  /** Apply a batch of parsed changes as a TYPE-2 history table (the
    * warehouse-side upgrade of the latest-state sink; batch analytics
    * counterpart: CdcQueries.scd2History / c06): every I/U closes the
    * entity's open version and appends a new numbered one; D closes the
    * open version and appends a closed tombstone row (op = 'D').
    *
    * Exactly-once effect under at-least-once delivery WITHOUT coordinator
    * state: every event writes exactly one row keyed PRIMARY KEY
    * (id, src_seq) where src_seq is the binlog coordinate — a redelivered
    * event is detected by one indexed point-lookup and skipped wholesale,
    * so close/append never double-applies (spec: full replay is a no-op).
    *
    * Expected DDL:
    * {{{
    * CREATE TABLE t (id BIGINT, ver INT, name VARCHAR(64), amount BIGINT,
    *                 op CHAR(1), src_seq VARCHAR(64), is_current BOOLEAN,
    *                 PRIMARY KEY (id, src_seq))
    * }}}
    *
    * Same distribution contract as [[applyChanges]]: repartition by id,
    * sortWithinPartitions by binlog (file, pos, row) — per-key apply
    * order holds on any number of executors.
    */
  def applyScd2(valid: DataFrame, url: String, table: String): Unit = {
    val projected = valid.select(
      col("id"),
      element_at(col("after"), "name").as("name"),
      element_at(col("after"), "amount").cast("long").as("amount"),
      col("op"),
      concat_ws(":", col("file"), col("pos"), col("row")).as("src_seq"),
      col("file"), col("pos"), col("row"))
    projected
      .repartition(col("id"))
      .sortWithinPartitions(col("file"), col("pos"), col("row"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn = DriverManager.getConnection(url)
          try rows.foreach(r => applyScd2One(conn, table, r))
          finally conn.close()
        }
      }
  }

  private def applyScd2One(conn: Connection, table: String,
      r: org.apache.spark.sql.Row): Unit = {
    val id = r.getLong(r.fieldIndex("id"))
    val seq = r.getString(r.fieldIndex("src_seq"))
    val op = r.getString(r.fieldIndex("op"))
    // redelivery gate: this event already left its row
    val seen = conn.prepareStatement(
      s"SELECT 1 FROM $table WHERE id = ? AND src_seq = ?")
    val already = try {
      seen.setLong(1, id); seen.setString(2, seq)
      val rs = seen.executeQuery(); try rs.next() finally rs.close()
    } finally seen.close()
    if (!already) {
      val close = conn.prepareStatement(
        s"UPDATE $table SET is_current = false WHERE id = ? AND is_current = true")
      try { close.setLong(1, id); close.executeUpdate() } finally close.close()
      val verSt = conn.prepareStatement(
        s"SELECT COALESCE(MAX(ver), 0) + 1 FROM $table WHERE id = ?")
      val ver = try {
        verSt.setLong(1, id)
        val rs = verSt.executeQuery(); try { rs.next(); rs.getInt(1) } finally rs.close()
      } finally verSt.close()
      val ins = conn.prepareStatement(
        s"INSERT INTO $table (id, ver, name, amount, op, src_seq, is_current)" +
          " VALUES (?, ?, ?, ?, ?, ?, ?)")
      try {
        ins.setLong(1, id)
        ins.setInt(2, ver)
        setName(ins, 3, r)
        setAmount(ins, 4, r)
        ins.setString(5, op)
        ins.setString(6, seq)
        ins.setBoolean(7, op != "D")
        ins.executeUpdate()
      } finally ins.close()
    }
  }
}
