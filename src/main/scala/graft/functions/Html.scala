package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the trafilatura/WET-class first stage of a
  * real pretraining pipeline (builder brief; the reference itself is
  * spreadsheet-only, so this is extension surface like the rest of the
  * t-family): boilerplate-aware markup stripping as pure native
  * expressions, so a 100 TB crawl shard is a mapper — no UDF, no
  * shuffle, whole-stage-codegen-friendly string/regex kernels.
  *
  * The extraction algebra, in order (each step is load-bearing and the
  * order is part of the contract):
  *
  *  1. '''Non-content subtree removal''': `<script>…</script>` and
  *     `<style>…</style>` spans drop whole (dotall non-greedy), BEFORE
  *     tag stripping — stripping first would leak JS/CSS bodies into
  *     the text, the classic naive-scraper bug.
  *  2. '''Block segmentation''': open/close tags of block-level
  *     elements ([[BlockTags]]) become newlines; the document becomes
  *     a block list. Inline elements (`<a> <b> <i> <span>`) do NOT
  *     break flow.
  *  3. '''Tag stripping''' (`<[^>]*>` → ''), per block. An
  *     UNTERMINATED trailing tag (truncated crawl payload) has no `>`
  *     and survives as visible text — degrade, don't die; the spec
  *     pins the branch.
  *  4. '''Entity decode''' of the five XML-standard entities
  *     (`&lt; &gt; &quot; &#39; &amp;` — amp LAST so `&amp;lt;` decodes
  *     to the literal `&lt;` and not to `<`), AFTER tag stripping so
  *     encoded angle brackets can never be re-parsed as markup.
  *  5. '''Whitespace normalization''': runs of space/tab/CR collapse
  *     to one space, trimmed. The class is explicit — `\s` is
  *     ASCII-plus-VT in Java but not RE2, and both engines must take
  *     the identical branch.
  *  6. '''Link-density boilerplate drop''': a block whose anchor text
  *     is more than half its total text (2·anchor_len > text_len,
  *     integer-exact — no FP threshold) is navigation/footer chrome,
  *     not content. Kept blocks rejoin with newlines in document
  *     order.
  *
  * The DuckDB twin (TextQueries `t47_html_extract`) replays every step
  * of this algebra verbatim, so the hash gate proves the two engines'
  * extraction identical character-for-character.
  */
object Html {

  /** Block-level elements whose tags break text flow. Alternation is
    * anchored by the `(?: [^>]*)?/?>` tail, so `<li>` matches but
    * `<link>` does not. Mirrored verbatim in the SQL twin. */
  private[graft] val BlockTags =
    "html|head|body|title|p|div|h1|h2|h3|li|ul|ol|br|tr|td|table"

  /** Step 1: drop script/style subtrees whole (dotall, non-greedy —
    * each span ends at its OWN closing tag). */
  def stripNonContent(h: Column): Column =
    regexp_replace(
      regexp_replace(h, "(?s)<script[^>]*>.*?</script>", ""),
      "(?s)<style[^>]*>.*?</style>", "")

  /** Step 2: block segmentation — block-tag boundaries → newline,
    * then split. */
  def blocks(h: Column): Column =
    split(regexp_replace(stripNonContent(h),
      s"</?(?:$BlockTags)(?: [^>]*)?/?>", "\n"), "\n")

  /** Step 4: the five XML-standard entities, amp last. */
  def decodeEntities(c: Column): Column =
    replace(replace(replace(replace(replace(c,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))

  /** Step 5: explicit ASCII class — identical in Java regex and RE2. */
  private def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "[ \\t\\r]+", " "))

  /** Steps 3–5 for one block: strip tags, decode entities, normalize
    * whitespace. */
  def cleanBlock(b: Column): Column =
    collapseWs(decodeEntities(regexp_replace(b, "<[^>]*>", "")))

  /** Anchor-text length of one block, under the SAME clean pipeline as
    * the block text so the density ratio compares like with like.
    * `[^<]*` bodies only: an anchor wrapping nested markup does not
    * count as link text (documented contract, spec-pinned). */
  def anchorTextLen(b: Column): Column =
    length(collapseWs(decodeEntities(array_join(
      regexp_extract_all(b, lit("<a[^>]*>([^<]*)</a>"), lit(1)), ""))))

  /** Steps 1–5 materialized: the non-empty (t, al) block array. Stage
    * THIS as its own projection column (t7's staging discipline): a
    * struct-returning one-shot [[extract]] gets its fields split by
    * SimplifyExtractValueOps, and the whole extraction then re-runs
    * once per output field — measured 4× the CPU on the t47 gate. */
  def cleanedBlocks(h: Column): Column = {
    val z = transform(blocks(h), b =>
      struct(cleanBlock(b).as("t"), anchorTextLen(b).as("al")))
    filter(z, s => length(s.getField("t")) > 0)
  }

  /** Step 6 keep-set over a STAGED cleanedBlocks attribute. */
  def keptBlocks(ne: Column): Column =
    filter(ne, s => s.getField("al") * 2 <= length(s.getField("t")))

  /** Kept text joined in document order, over a STAGED kept attribute. */
  def joinedText(kept: Column): Column =
    array_join(transform(kept, s => s.getField("t")), "\n")

  /** The full extraction verdict for one HTML document:
    * struct(n_blocks, n_boiler, text, n_chars) where n_blocks counts
    * non-empty blocks, n_boiler the link-dense ones dropped, and text
    * is the kept blocks joined by newline in document order. All
    * higher-order-function work is per-document — a corpus extraction
    * is embarrassingly parallel. ONE-SHOT convenience (specs, single-
    * field consumers): a query emitting several verdict fields must
    * stage [[cleanedBlocks]]/[[keptBlocks]]/[[joinedText]] as separate
    * projections instead — see the t47 query. */
  def extract(h: Column): Column = {
    val ne = cleanedBlocks(h)
    val kept = keptBlocks(ne)
    val txt = joinedText(kept)
    struct(
      size(ne).cast("long").as("n_blocks"),
      (size(ne) - size(kept)).cast("long").as("n_boiler"),
      txt.as("text"),
      length(txt).cast("long").as("n_chars"))
  }
}
