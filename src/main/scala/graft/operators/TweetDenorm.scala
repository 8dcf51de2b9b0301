package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Analyzers

/** The reference's denormalizing query, exactly (kuko6/tweets-elastic
  * `src/main.py:43-101` / `src/used_queries/queries.sql:18-71`): 10
  * normalized tables → one nested document per conversation with the
  * schema of `src/config/mapping.json` (FIXTURES.md §A, golden instance
  * `docs/sample_document.json`).
  *
  * Shapes preserved from the reference, re-expressed in Spark:
  *  - 5 pre-aggregated left-joined child subqueries (`json_agg(
  *    json_build_object(...))` → `collect_list(struct(...))`,
  *    groupBy-before-join exactly like the hand-written SQL);
  *  - the conversation_references self-join to the parent conversation
  *    (J10, `src/main.py:95`);
  *  - both correlated scalar subqueries decorrelated: parent author
  *    (J11, `src/main.py:82-86`) as a join, parent hashtags (J12,
  *    `src/main.py:87-92`) as groupBy + left join;
  *  - `COALESCE(..., '[]')` → empty arrays, never null
  *    (`src/main.py:47-51`); nullable leaf strings stay null;
  *  - `created_at` parsed with the mapping's explicit format
  *    (`yyyy-MM-dd'T'HH:mm:ssXXX`, `mapping.json:16-19`);
  *  - optionally the index-time analyzer multi-fields
  *    (`mapping.json:5-8,23-54`): content → englando tokens,
  *    author.name → ngram + shingle tokens, etc., materialized as
  *    token-array columns — the Spark analog of ES analyzing at
  *    indexing time, amortized across queries.
  */
object TweetDenorm {

  private def emptyArr(df: DataFrame, c: String): Column =
    coalesce(col(c), array().cast(df.schema(c).dataType))

  /** @param conversations  (id, content, possibly_sensitive, language,
    *                        source, retweet_count, reply_count,
    *                        like_count, quote_count, created_at string,
    *                        author_id)
    * other params: normalized child/dim tables per FIXTURES.md §A. */
  def docs(conversations: DataFrame, authors: DataFrame,
           contextAnnotations: DataFrame, contextEntities: DataFrame,
           contextDomains: DataFrame, conversationHashtags: DataFrame,
           hashtags: DataFrame, annotations: DataFrame, links: DataFrame,
           conversationReferences: DataFrame,
           withAnalyzers: Boolean = false): DataFrame = {

    // J2/J3/J4 + A1: context annotations with entity/domain resolved
    val ca = contextAnnotations
      .join(broadcast(contextEntities.select(
        col("id").as("ce_id"), col("name").as("ce_name"),
        col("description").as("ce_desc"))),
        col("context_entity_id") === col("ce_id"))
      .join(broadcast(contextDomains.select(
        col("id").as("cd_id"), col("name").as("cd_name"),
        col("description").as("cd_desc"))),
        col("context_domain_id") === col("cd_id"))
      .groupBy(col("conversation_id"))
      // insertion order, distributed-correct (same pattern as
      // Denorm.childrenPerOrder): the child row's serial id rides as
      // the leading sort key and is stripped after the sort — the
      // arrays come out exactly as Postgres json_agg emits them from
      // an id-ordered fetch. collect_list alone cannot promise any
      // order on a cluster.
      .agg(transform(
        sort_array(collect_list(struct(
          col("id").as("seq"),
          struct(col("ce_id").as("id"), col("ce_name").as("name"),
            col("ce_desc").as("description")).as("entity"),
          struct(col("cd_id").as("id"), col("cd_name").as("name"),
            col("cd_desc").as("description")).as("domain")))),
        s => struct(s.getField("entity").as("entity"),
          s.getField("domain").as("domain")))
        .as("context_annotations"))

    // J5/J6 + A1: hashtags through the bridge table
    val hashtagsFor = (bridge: DataFrame) => bridge
      .join(broadcast(hashtags.select(col("id").as("h_id"), col("tag"))),
        col("hashtag_id") === col("h_id"))
      .groupBy(col("conversation_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("id").as("seq"), col("tag")))),
        s => struct(s.getField("tag").as("tag"))).as("hashtags"))
    val ch = hashtagsFor(conversationHashtags)
      .withColumnRenamed("hashtags", "conversation_hashtags")

    // J7 + A1: annotations (value, type, probability — half_float →
    // FloatType, documented precision divergence SURVEY §1.2)
    val an = annotations
      .groupBy(col("conversation_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("id").as("seq"),
          col("value"), col("type"),
          col("probability").cast("float").as("probability")))),
        s => struct(s.getField("value").as("value"),
          s.getField("type").as("type"),
          s.getField("probability").as("probability")))
        .as("annotations"))

    // J8 + A1: links (title/description stay null when absent)
    val li = links
      .groupBy(col("conversation_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("id").as("seq"),
          col("url"), col("title"), col("description")))),
        s => struct(s.getField("url").as("url"),
          s.getField("title").as("title"),
          s.getField("description").as("description"))).as("links"))

    // J9 + J10 + J11 + J12 + A1: references to parent conversations
    val parentHashtags = hashtagsFor(conversationHashtags)
      .select(col("conversation_id").as("ph_id"), col("hashtags"))
    val cr = conversationReferences
      .join(conversations.select(col("id").as("p_id"),
        col("content").as("p_content"), col("author_id").as("p_author_id")),
        col("parent_id") === col("p_id")) // J10 self-join
      .join(authors.select(col("id").as("pa_id"), col("name").as("pa_name"),
        col("username").as("pa_username")),
        col("p_author_id") === col("pa_id")) // J11 decorrelated
      .join(parentHashtags, col("p_id") === col("ph_id"), "left") // J12
      .groupBy(col("conversation_id"))
      .agg(transform(
        sort_array(collect_list(struct(
          col("id").as("seq"),
          col("p_id").as("id"),
          col("type"),
          col("p_content").as("content"),
          struct(col("pa_id").as("id"), col("pa_name").as("name"),
            col("pa_username").as("username")).as("author"),
          coalesce(col("hashtags"),
            array().cast("array<struct<tag:string>>")).as("hashtags")))),
        s => struct(s.getField("id").as("id"),
          s.getField("type").as("type"),
          s.getField("content").as("content"),
          s.getField("author").as("author"),
          s.getField("hashtags").as("hashtags")))
        .as("conversation_references"))

    // J1 + final projection
    val authorStruct = struct(
      col("a.id").as("id"), col("a.name").as("name"),
      col("a.username").as("username"), col("a.description").as("description"),
      col("a.followers_count").as("followers_count"),
      col("a.following_count").as("following_count"),
      col("a.tweet_count").as("tweet_count"),
      col("a.listed_count").as("listed_count"))

    val base = conversations.as("c")
      .join(authors.as("a"), col("c.author_id") === col("a.id"), "inner")
      .join(ca, col("c.id") === ca("conversation_id"), "left")
      .join(ch, col("c.id") === ch("conversation_id"), "left")
      .join(an, col("c.id") === an("conversation_id"), "left")
      .join(li, col("c.id") === li("conversation_id"), "left")
      .join(cr, col("c.id") === cr("conversation_id"), "left")

    val out = base.select(
      col("c.id").as("id"),
      col("c.content").as("content"),
      col("c.possibly_sensitive").as("possibly_sensitive"),
      col("c.language").as("language"),
      col("c.source").as("source"),
      col("c.retweet_count").as("retweet_count"),
      col("c.reply_count").as("reply_count"),
      col("c.like_count").as("like_count"),
      col("c.quote_count").as("quote_count"),
      to_timestamp(col("c.created_at"), "yyyy-MM-dd'T'HH:mm:ssXXX")
        .as("created_at"),
      authorStruct.as("author"),
      emptyArr(base, "context_annotations").as("context_annotations"),
      emptyArr(base, "conversation_hashtags").as("conversation_hashtags"),
      emptyArr(base, "annotations").as("annotations"),
      emptyArr(base, "links").as("links"),
      emptyArr(base, "conversation_references").as("conversation_references"))

    if (!withAnalyzers) out
    else out // index-time analysis: the mapping's multi-fields as token columns
      .withColumn("content_tokens", Analyzers.englando(col("content")))
      .withColumn("author_name_ngrams", Analyzers.customNgram(col("author.name")))
      .withColumn("author_name_shingles", Analyzers.customShingles(col("author.name")))
      .withColumn("author_username_ngrams", Analyzers.customNgram(col("author.username")))
      .withColumn("author_description_tokens", Analyzers.englando(col("author.description")))
      .withColumn("hashtag_tokens",
        transform(col("conversation_hashtags"), h => lower(h.getField("tag"))))
  }
}
