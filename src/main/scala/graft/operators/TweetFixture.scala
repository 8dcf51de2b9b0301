package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-memory instance of the reference's normalized schema
  * (FIXTURES.md §A), carrying the rows behind
  * `docs/sample_document.json` — used by the `tweet_denorm` query and
  * the golden-document spec. */
object TweetFixture {
  val mainId = 1497032529894805509L
  val parentId = 1496727690157588483L

  def conversations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (mainId,
        "RT @one_sorrow: SPREAD AND SHARE, YOU CAN HELP UKRAINE #Ukraine #Russia https://t.co/rp2IFCKMi3",
        false, "en", "Twitter for Android", 6085, 0, 0, 0,
        "2022-02-25T03:15:43+01:00", 1409764954845159428L),
      (parentId,
        "SPREAD AND SHARE, YOU CAN HELP UKRAINE #Ukraine #Russia https://t.co/rp2IFCKMi3",
        false, "en", "Twitter Web App", 6085, 3, 9000, 50,
        "2022-02-24T21:00:00+01:00", 1068701541979185155L)
    ).toDF("id", "content", "possibly_sensitive", "language", "source",
      "retweet_count", "reply_count", "like_count", "quote_count",
      "created_at", "author_id")
  }

  def authors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1409764954845159428L, "ted | wil | alex", "michaelkinnie",
        "★they/he/it/xey★", 9, 126, 1181, 0),
      (1068701541979185155L, "One for Pocskie", "one_sorrow",
        "just someone", 1000, 10, 5000, 3)
    ).toDF("id", "name", "username", "description", "followers_count",
      "following_count", "tweet_count", "listed_count")
  }

  // Child/bridge tables carry the Postgres schema's serial `id`
  // (protokol.md:53 — the author dropped those ids only from the ES
  // MAPPING, the tables have them), which is what makes the
  // reference's json_agg insertion order reproducible: children are
  // fetched in id order.
  def contextAnnotations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // duplicated on purpose: the golden document repeats an identical
    // context annotation (docs/sample_document.json:26-51)
    Seq((1L, mainId, 1484601166080081920L, 123L),
      (2L, mainId, 1484601166080081920L, 123L))
      .toDF("id", "conversation_id", "context_entity_id",
        "context_domain_id")
  }

  def contextEntities(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1484601166080081920L, "Russo-Ukrainian conflict",
      Option.empty[String])).toDF("id", "name", "description")
  }

  def contextDomains(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((123L, "Ongoing News Story",
      Option("Ongoing News Stories like 'Brexit'")))
      .toDF("id", "name", "description")
  }

  def conversationHashtags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // insertion order = the sample document's array order:
    // Ukraine (10) before Russia (11) for both conversations
    Seq((1L, mainId, 10L), (2L, mainId, 11L),
      (3L, parentId, 10L), (4L, parentId, 11L))
      .toDF("id", "conversation_id", "hashtag_id")
  }

  def hashtags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((10L, "Ukraine"), (11L, "Russia")).toDF("id", "tag")
  }

  def annotations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, mainId, "UKRAINE", "Place", 0.954))
      .toDF("id", "conversation_id", "value", "type", "probability")
  }

  def links(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, mainId,
      "https://twitter.com/one_sorrow/status/1496727690157588483/photo/1",
      Option.empty[String], Option.empty[String]))
      .toDF("id", "conversation_id", "url", "title", "description")
  }

  def conversationReferences(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, mainId, parentId, "retweeted"))
      .toDF("id", "conversation_id", "parent_id", "type")
  }

  /** The full denormalized fixture — the reference's ETL output shape,
    * analyzer multi-fields included. */
  def docs(spark: SparkSession, withAnalyzers: Boolean = true): DataFrame =
    TweetDenorm.docs(conversations(spark), authors(spark),
      contextAnnotations(spark), contextEntities(spark),
      contextDomains(spark), conversationHashtags(spark), hashtags(spark),
      annotations(spark), links(spark), conversationReferences(spark),
      withAnalyzers)
}
