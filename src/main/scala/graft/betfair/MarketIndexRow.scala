package graft.betfair

/** Typed view of one index row — the public-API Dataset boundary
  * (SURVEY.md §1.4: DataFrame for the column-name-driven ETL, one typed
  * Dataset at the API edge). Field order matches the 37-column contract.
  */
case class MarketIndexRow(
    marketId: String,
    marketName: Option[String],
    marketStartTime: Option[String],
    persistenceEnabled: Option[Boolean],
    bspMarket: Option[Boolean],
    marketTime: Option[String],
    suspendTime: Option[String],
    bettingType: Option[String],
    turnInPlayEnabled: Option[Boolean],
    marketType: Option[String],
    numberOfWinners: Option[Int],
    priceLadderDescriptionType: Option[String],
    lineRangeInfoMarketUnit: Option[String],
    eachWayDivisor: Option[Double],
    raceType: Option[String],
    runners: Option[Int],
    eventTypeId: Option[String],
    eventTypeName: Option[String],
    competitionId: Option[String],
    competitionName: Option[String],
    eventId: Option[String],
    eventName: Option[String],
    eventCountryCode: Option[String],
    eventTimezone: Option[String],
    eventVenue: Option[String],
    eventOpenDate: Option[String],
    marketSettledTime: Option[String],
    localDayOfWeek: Option[String],
    localMarketStartTime: Option[String],
    localEventOpenDate: Option[String],
    localMarketSettledTime: Option[String],
    raceId: Option[String],
    raceTypeFromName: Option[String],
    raceDistanceMeters: Option[Double],
    raceDistanceFurlongs: Option[Double],
    marketMetadataFilePath: String,
    marketDataFilePath: String) {

  def isRacing: Boolean = eventTypeId.exists(Schemas.RacingEventTypeIds.contains)
}
