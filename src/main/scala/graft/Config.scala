package graft

import java.io.FileInputStream
import java.util.Properties

/** Pipeline configuration file — the reference reads config.ini with
  * db paths, API credentials and the two request-chunk limits
  * (reference config.py:17–36). The engine's analog is a properties file;
  * API credentials drop out (the scorer is native / pluggable) and the
  * chunk limits feed [[ops.ExternalScorer]].
  *
  *   data.dir=/data/testdata/sf0.01
  *   out.dir=/data/out
  *   start.date=2024-01-10        # optional, inclusive
  *   end.date=2024-01-20          # optional, inclusive
  *   max.journeys.per.request=100
  *   max.sessions.per.request=2000
  *   max.sessions.per.conversion=100000   # optional — skew gate: conversions
  *                                        # above the cap are skipped before
  *                                        # the scorer window (C2 semantics;
  *                                        # AQE cannot split window skew)
  */
final case class Config(
    dataDir: String,
    outDir: String,
    startDate: Option[String],
    endDate: Option[String],
    maxJourneysPerRequest: Int,
    maxSessionsPerRequest: Int,
    maxSessionsPerConversion: Option[Int])

object Config {

  val Defaults: Config =
    Config("/root/testdata/sf0.001", "/tmp/graft-out", None, None, 100, 2000, None)

  def load(path: String): Config = {
    val p = new Properties()
    val in = new FileInputStream(path)
    try p.load(in)
    finally in.close()
    def opt(k: String): Option[String] = Option(p.getProperty(k)).map(_.trim).filter(_.nonEmpty)
    Config(
      dataDir = opt("data.dir").getOrElse(Defaults.dataDir),
      outDir = opt("out.dir").getOrElse(Defaults.outDir),
      startDate = opt("start.date"),
      endDate = opt("end.date"),
      maxJourneysPerRequest = opt("max.journeys.per.request").map(_.toInt)
        .getOrElse(Defaults.maxJourneysPerRequest),
      maxSessionsPerRequest = opt("max.sessions.per.request").map(_.toInt)
        .getOrElse(Defaults.maxSessionsPerRequest),
      maxSessionsPerConversion = opt("max.sessions.per.conversion").map(_.toInt))
  }
}
