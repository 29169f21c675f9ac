package graft

/** Engine configuration mirroring the reference's env-based singleton
  * (config/config.go:9-33, envconfig tags). Same knobs, same defaults;
  * parsed from an explicit map so tests don't mutate the process env.
  */
final case class GraftConfig(
    kafkaAddress: String,
    dbAddress: String,
    groupId: String,
    server: String,
    db: String,
    tables: Seq[String],
    autoOffset: String,
    republishLimit: Int,
    reclaim: Boolean,
    replaceAllScheme: Boolean,
    activeScheme: Boolean,
    withTimezone: Boolean,
    timezoneShiftHours: Int,
    apiAddress: String,
    connectorName: String)

object GraftConfig {
  /** Defaults follow config/config.go: republish limit 3 (:21), latest
    * offset reset (:25), no reclaim (:15), no schema replace-all (:27).
    * The reference reads `TimeZone` but never uses it and hardcodes ±7h
    * (main.go:272,296) — here the shift is an explicit knob defaulting to
    * that quirk value.
    */
  def fromEnv(env: Map[String, String]): GraftConfig = GraftConfig(
    kafkaAddress = env.getOrElse("KAFKA_ADDRESS", "localhost:9092"),
    dbAddress = env.getOrElse("DB_ADDRESS", ""),
    groupId = env.getOrElse("GROUP_ID", "graft"),
    server = env.getOrElse("SERVER_NAME", "dbserver1"),
    db = env.getOrElse("DB_NAME", ""),
    tables = env.getOrElse("TABLES", "").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
    autoOffset = env.getOrElse("AUTO_OFFSET", "latest"),
    republishLimit = env.getOrElse("REPUBLISH_LIMIT", "3").toInt,
    reclaim = env.getOrElse("RECLAIM", "false").toBoolean,
    replaceAllScheme = env.getOrElse("REPLACE_ALL_SCHEME", "false").toBoolean,
    activeScheme = env.getOrElse("ACTIVE_SCHEME", "false").toBoolean,
    withTimezone = env.getOrElse("WITH_TIMEZONE", "false").toBoolean,
    timezoneShiftHours = env.getOrElse("TIMEZONE_SHIFT_HOURS", "7").toInt,
    apiAddress = env.getOrElse("API_ADDRESS", "http://localhost:8083"),
    connectorName = env.getOrElse("CONNECTOR_NAME", "connector"))
}
