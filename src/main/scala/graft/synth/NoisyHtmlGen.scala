package graft.synth

/** Deterministic noisy web pages for the text-density / link-density
  * boilerplate classifier ([[graft.ops.Boilerplate]]).
  *
  * The expectation is derived from CONSTRUCTION + the published
  * thresholds, not by running the classifier: every block is built inside
  * a region of the rule space where its label is invariant to its
  * neighbors —
  *   - nav / sidebar / footer / byline blocks have linkDensity >= 0.5
  *     (every word — or at least half — inside `<a>`), strictly above the
  *     1/3 cutoff -> boilerplate regardless of prev/next;
  *   - the headline has 2-8 plain words and is immediately followed by
  *     the 41+-word lead paragraph (next.numWords > 17 beats both
  *     branches) -> content;
  *   - the lead paragraph has >= 41 plain words (content even after a
  *     link-dense block, words > 40);
  *   - every further paragraph has 17-40 plain words with a plain
  *     paragraph before it (prev.linkDensity 0 <= 0.555556 and
  *     curr.numWords > 16) -> content.
  * Expected main content = headline + paragraphs, exactly.
  */
object NoisyHtmlGen {

  private val Words = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and",
    "then", "some", "more", "copy", "reads", "cleanly", "without", "links",
    "while", "navigation", "chrome", "stays", "short", "dense", "page",
    "body", "text", "flows", "across", "sentences", "that", "carry",
    "actual", "information", "for", "readers", "here")

  private def sentence(r: java.util.SplittableRandom, n: Int): String =
    (0 until n).map(_ => Words(r.nextInt(Words.length))).mkString(" ")

  private def navBlock(r: java.util.SplittableRandom, items: Int): String =
    "<ul>" + (0 until items).map { _ =>
      s"""<li><a href="/x${r.nextInt(1000)}">${sentence(r, 1 + r.nextInt(3))}</a></li>"""
    }.mkString + "</ul>"

  /** one page: (html, expected content blocks in order) */
  def page(seed: Long): (String, Vector[String]) = {
    val r = new java.util.SplittableRandom(seed)
    val headline = sentence(r, 2 + r.nextInt(7))          // 2-8 words
    val lead = sentence(r, 41 + r.nextInt(20))            // 41-60 words
    val paras = Vector.fill(2 + r.nextInt(5))(sentence(r, 17 + r.nextInt(24))) // 17-40
    // byline: >= half the words linked -> linkDensity >= 0.5 -> boilerplate
    val byline =
      s"""<p>by <a href="/a">${sentence(r, 2)}</a> <a href="/t">${sentence(r, 1)}</a></p>"""
    val html = new StringBuilder
    html ++= "<html><head><title>site chrome</title>"
    html ++= "<script>var tracking = 'noise';</script>"
    html ++= "<style>body { color: red }</style></head><body>"
    html ++= "<nav>" + navBlock(r, 4 + r.nextInt(4)) + "</nav>"
    // headline is IMMEDIATELY followed by the 41+-word lead: its
    // content-label then holds on both tree branches (next.numWords > 17)
    html ++= s"<h1>$headline</h1>"
    html ++= s"<p>$lead</p>"
    paras.foreach(p => html ++= s"<p>$p</p>")
    // byline sits after the body copy: the last paragraph's label never
    // depends on its next block (prev is a plain paragraph, words > 16)
    html ++= byline
    html ++= "<aside>" + navBlock(r, 3 + r.nextInt(3)) + "</aside>"
    html ++= "<footer>" + navBlock(r, 2 + r.nextInt(3)) + "</footer>"
    html ++= "</body></html>"
    (html.toString, headline +: lead +: paras)
  }
}
