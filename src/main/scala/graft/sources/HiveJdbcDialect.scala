package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** JDBC dialect for HiveServer2-protocol endpoints (`jdbc:hive2://` —
  * Hive, Spark Thrift Server, Kyuubi). Spark ships no hive2 dialect,
  * so these URLs fall through to the no-op default, which quotes
  * identifiers with DOUBLE QUOTES — HiveQL rejects that on the very
  * first schema probe (`SELECT * FROM (..) t WHERE 1=0` is fine, but
  * any column pruning or filter pushdown emits `"col"` and dies). This
  * dialect backtick-quotes identifiers (the HiveQL rule), so pruned
  * and filter-pushed reads work against a second real wire dialect —
  * the S6 connector claim exercised beyond Derby (`ConnectorsSpec`
  * runs it against an in-process Spark Thrift Server).
  *
  * Registration is idempotent and must happen before the first
  * `format("jdbc")` read of a hive2 URL: call [[register]] once per
  * JVM (Spark keeps a global dialect registry).
  */
object HiveJdbcDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:hive2")

  override def quoteIdentifier(colName: String): String =
    s"`${colName.replace("`", "``")}`"

  /** HiveQL type names where the JDBC-standard defaults differ. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("STRING", Types.VARCHAR))
    case BinaryType => Some(JdbcType("BINARY", Types.BINARY))
    case ByteType => Some(JdbcType("TINYINT", Types.TINYINT))
    case _ => None
  }

  def register(): Unit = JdbcDialects.registerDialect(this)
}
