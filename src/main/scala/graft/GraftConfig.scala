package graft

/** Engine configuration mirroring the reference's env-based singleton
  * (config/config.go:7-30, envconfig tags) — same env names, same
  * defaults; parsed from an explicit map so tests don't mutate the
  * process env.
  */
final case class GraftConfig(
    dbAddress: String,
    dbSourceName: String,
    dbUser: String,
    dbPassword: String,
    dbPort: Int,
    dbLog: Boolean,
    kafkaAddress: String,
    reclaim: Boolean,
    server: String,
    db: String,
    tables: Seq[String],
    groupId: String,
    republish: Boolean,
    republishLimit: Int,
    connectorName: String,
    debeziumAddr: String,
    debeziumPort: String,
    autoOffset: String,
    activeScheme: Boolean,
    replaceAllScheme: Boolean,
    withTimezone: Boolean,
    timezoneShiftHours: Int) {

  /** Connect REST base URL (client/debezium.go builds addr:port paths). */
  def apiAddress: String = s"http://$debeziumAddr:$debeziumPort"
}

object GraftConfig {
  /** Env names and defaults follow config/config.go verbatim: REPUBLISH
    * default true (:20), REPUBLISH_LIMIT 3 (:21), AUTO_OFFSET latest
    * (:25), RECLAIM false (:15), REPLACE_ALL_SCHEME **true** (:27),
    * ACTIVE_SCHEME false (:26). The reference reads `TIMEZONE` (:29) but
    * hardcodes ±7h in the decoders (main.go:272,296); here the knob is
    * actually honored, defaulting to the same 7.
    */
  def fromEnv(env: Map[String, String]): GraftConfig = GraftConfig(
    dbAddress = env.getOrElse("DBADDRESS", "localhost"),
    dbSourceName = env.getOrElse("DBSOURCE", "master_etl"),
    dbUser = env.getOrElse("DBUSER", "etl_master"),
    dbPassword = env.getOrElse("DBPASSWORD", ""),
    dbPort = env.getOrElse("DBPORT", "3306").toInt,
    dbLog = env.getOrElse("DB_LOG", "false").toBoolean,
    kafkaAddress = env.getOrElse("KAFKA", "localhost:9092"),
    reclaim = env.getOrElse("RECLAIM", "false").toBoolean,
    server = env.getOrElse("SERVER", "dbserver_name"),
    db = env.getOrElse("DBNAME", "db_name"),
    tables = env.getOrElse("TABLE", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
    groupId = env.getOrElse("GROUP", "name-group"),
    republish = env.getOrElse("REPUBLISH", "true").toBoolean,
    republishLimit = env.getOrElse("REPUBLISH_LIMIT", "3").toInt,
    connectorName = env.getOrElse("CONNECTOR", "etl-connector-name"),
    debeziumAddr = env.getOrElse("DEBEZIUM_ADDR", "localhost"),
    debeziumPort = env.getOrElse("DEBEZIUM_PORT", "8083"),
    autoOffset = env.getOrElse("AUTO_OFFSET", "latest"),
    activeScheme = env.getOrElse("ACTIVE_SCHEME", "false").toBoolean,
    replaceAllScheme = env.getOrElse("REPLACE_ALL_SCHEME", "true").toBoolean,
    withTimezone = env.getOrElse("WITH_TIMEZONE", "false").toBoolean,
    timezoneShiftHours = env.getOrElse("TIMEZONE", "7").toInt)
}
