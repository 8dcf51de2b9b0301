package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-document test (SURVEY.md §5.2): rebuild the exact nested
  * document of the reference's `docs/sample_document.json` from
  * normalized input rows. Array ordering is deterministic (sorted)
  * rather than insertion-order — the documented divergence of
  * SURVEY.md §7 risk (4); content is asserted exactly.
  */
class TweetDenormSpec extends SparkSpec {
  import spark.implicits._

  val mainId = operators.TweetFixture.mainId
  val parentId = operators.TweetFixture.parentId

  lazy val docs = operators.TweetFixture.docs(spark, withAnalyzers = false)
    .cache()

  lazy val main: Row = docs.filter(col("id") === mainId).head()
  lazy val parent: Row = docs.filter(col("id") === parentId).head()

  test("schema matches the reference mapping (FIXTURES.md §A)") {
    assert(docs.schema.fieldNames.toSeq == Seq("id", "content",
      "possibly_sensitive", "language", "source", "retweet_count",
      "reply_count", "like_count", "quote_count", "created_at", "author",
      "context_annotations", "conversation_hashtags", "annotations",
      "links", "conversation_references"))
    val author = docs.schema("author").dataType.asInstanceOf[StructType]
    assert(author.fieldNames.toSeq == Seq("id", "name", "username",
      "description", "followers_count", "following_count", "tweet_count",
      "listed_count"))
    val ann = docs.schema("annotations").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(ann("probability").dataType == FloatType) // half_float analog
    assert(docs.schema("created_at").dataType == TimestampType)
  }

  test("golden document: scalars, author, created_at tz-normalized") {
    assert(main.getAs[String]("content").startsWith("RT @one_sorrow"))
    assert(main.getAs[Int]("retweet_count") == 6085)
    val author = main.getAs[Row]("author")
    assert(author.getAs[Long]("id") == 1409764954845159428L)
    assert(author.getAs[String]("username") == "michaelkinnie")
    // +01:00 → UTC (session TZ pinned UTC)
    assert(main.getAs[java.sql.Timestamp]("created_at").toInstant ==
      java.time.Instant.parse("2022-02-25T02:15:43Z"))
  }

  test("golden document: duplicate context annotations preserved, null leaf") {
    val cas = main.getSeq[Row](main.fieldIndex("context_annotations"))
    assert(cas.length == 2 && cas(0) == cas(1))
    val entity = cas.head.getAs[Row]("entity")
    assert(entity.getAs[String]("name") == "Russo-Ukrainian conflict")
    assert(entity.getAs[String]("description") == null) // stays null
    val domain = cas.head.getAs[Row]("domain")
    assert(domain.getAs[Long]("id") == 123L)
  }

  test("golden document: hashtags, annotations, links") {
    val tags = main.getSeq[Row](main.fieldIndex("conversation_hashtags"))
      .map(_.getAs[String]("tag"))
    assert(tags == Seq("Ukraine", "Russia")) // sample_document.json insertion order
    val ann = main.getSeq[Row](main.fieldIndex("annotations")).head
    assert(ann.getAs[String]("value") == "UKRAINE" &&
      ann.getAs[String]("type") == "Place" &&
      math.abs(ann.getAs[Float]("probability") - 0.954f) < 1e-6)
    val link = main.getSeq[Row](main.fieldIndex("links")).head
    assert(link.getAs[String]("url").contains("/photo/1"))
    assert(link.getAs[String]("title") == null &&
      link.getAs[String]("description") == null)
  }

  test("golden document: reference resolves parent, its author and hashtags") {
    val ref = main.getSeq[Row](main.fieldIndex("conversation_references")).head
    assert(ref.getAs[Long]("id") == parentId)
    assert(ref.getAs[String]("type") == "retweeted")
    assert(ref.getAs[String]("content").startsWith("SPREAD AND SHARE"))
    val pa = ref.getAs[Row]("author")
    assert(pa.getAs[Long]("id") == 1068701541979185155L &&
      pa.getAs[String]("username") == "one_sorrow")
    assert(ref.getSeq[Row](ref.fieldIndex("hashtags"))
      .map(_.getAs[String]("tag")) == Seq("Ukraine", "Russia"))
  }

  test("absent children are empty arrays, not null (COALESCE semantics)") {
    assert(parent.getSeq[Row](parent.fieldIndex("links")).isEmpty)
    assert(parent.getSeq[Row](parent.fieldIndex("annotations")).isEmpty)
    assert(parent.getSeq[Row](parent.fieldIndex("conversation_references")).isEmpty)
    assert(parent.getSeq[Row](parent.fieldIndex("conversation_hashtags"))
      .nonEmpty) // parent does have hashtags
  }

  test("index-time analyzer multi-fields materialize as token columns") {
    val analyzed = operators.TweetFixture.docs(spark, withAnalyzers = true)
    val r = analyzed.filter(col("id") === mainId).head()
    val toks = r.getSeq[String](r.fieldIndex("content_tokens"))
    assert(toks.contains("ukrain")) // englando-stemmed
    assert(r.getSeq[String](r.fieldIndex("hashtag_tokens"))
      == Seq("ukraine", "russia")) // sample_document.json insertion order
    assert(r.getSeq[String](r.fieldIndex("author_username_ngrams"))
      .contains("michael"))
  }
}
