#!/usr/bin/env python3
"""HTML fixture generator: deterministic synthetic pages + expected
main-content extraction.

Writes one parquet file under fixtures/html/:
  htmldocs.parquet  doc_id BIGINT, html VARCHAR,
                    main_text VARCHAR, scope VARCHAR   (input + oracle)

The pages are generated here and the expected extraction is computed
with Python's stdlib `html.parser` (an event-driven tokenizer — a
*different stack* from the engine's single-pass Scala scanner), so the
fixture pins the shared extraction SPEC, not one implementation:

  - <script>/<style> subtrees: dropped (raw-text mode, like browsers)
  - boilerplate subtrees <head>/<nav>/<header>/<footer>/<aside>: dropped
  - main-content choice: text inside <main> if non-blank, else inside
    <article>, else the whole remaining document ("scope" records which)
  - BLOCK tags (html, body, title, section, main, article, nav, header,
    footer, aside, head, p, div, ul, ol, li, h1..h6, br, table, tr, td,
    th, blockquote, pre) contribute a whitespace separator at start,
    end, and self-close; inline tags (span, b, i, a, em, strong, code,
    img) contribute nothing
  - entities: &amp; &lt; &gt; &quot; &apos; &nbsp; decode (nbsp to a
    plain space); unknown named entities stay literal ("&zzz;");
    numeric charrefs &#NN;/&#xHH; decode to their code point
  - final text = whitespace-collapsed ([ \\t\\n\\r\\f\\v]+ -> one
    space, trimmed) concatenation of the surviving text

Generated pages exercise: nested boilerplate, main/article present/
absent/empty, quoted '>' and '<' inside attribute values, entities and
charrefs in text, comments containing tags, script/style bodies
containing fake tags and ampersands, self-closing tags, DOCTYPE.
"""
import random
import re
from html.parser import HTMLParser

import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 5000  # covers doc_id 0..4999 (sf0.001/0.01/0.1 documents)
OUT_DIR = "/root/repo/fixtures/html"

BLOCK = {
    "html", "body", "title", "section", "main", "article", "nav",
    "header", "footer", "aside", "head", "p", "div", "ul", "ol", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "br", "table", "tr", "td",
    "th", "blockquote", "pre",
}
SKIP = {"head", "nav", "header", "footer", "aside"}
ENTITY = {"amp": "&", "lt": "<", "gt": ">", "quot": '"',
          "apos": "'", "nbsp": " "}
WS = re.compile(r"[ \t\n\r\f\v]+")


class Extractor(HTMLParser):
    """Reference implementation of the extraction spec (see module doc)."""

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.all, self.main, self.art = [], [], []
        self.skip = 0
        self.main_d = 0
        self.art_d = 0
        self.raw = False

    def _emit(self, t):
        if self.raw or self.skip > 0:
            return
        self.all.append(t)
        if self.main_d > 0:
            self.main.append(t)
        if self.art_d > 0:
            self.art.append(t)

    def handle_starttag(self, tag, attrs):
        if tag in BLOCK:
            self._emit(" ")  # before skip++ so it lands in outer scopes
        if tag in ("script", "style"):
            self.raw = True
        elif tag in SKIP:
            self.skip += 1
        elif tag == "main":
            self.main_d += 1
        elif tag == "article":
            self.art_d += 1

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self.raw = False
        elif tag in SKIP:
            self.skip = max(0, self.skip - 1)
        elif tag == "main":
            self.main_d = max(0, self.main_d - 1)
        elif tag == "article":
            self.art_d = max(0, self.art_d - 1)
        if tag in BLOCK:
            self._emit(" ")  # after skip-- so it lands in outer scopes

    def handle_startendtag(self, tag, attrs):
        if tag in BLOCK:
            self._emit(" ")

    def handle_data(self, data):
        self._emit(data)

    def handle_entityref(self, name):
        self._emit(ENTITY.get(name, "&" + name + ";"))

    def handle_charref(self, ref):
        cp = int(ref[1:], 16) if ref[0] in "xX" else int(ref)
        self._emit(chr(cp))


def collapse(parts):
    return WS.sub(" ", "".join(parts)).strip()


def extract(html):
    p = Extractor()
    p.feed(html)
    p.close()
    main, art, all_ = collapse(p.main), collapse(p.art), collapse(p.all)
    if main:
        return main, "main"
    if art:
        return art, "article"
    return all_, "all"


WORDS = ("data set spark shard merge token corpus crawl page index "
         "filter quality rank batch stream column row join scan write "
         "model train eval dedup shingle").split()


def words(rng, lo, hi):
    n = rng.randint(lo, hi)
    out = []
    for _ in range(n):
        w = rng.choice(WORDS)
        r = rng.random()
        if r < 0.06:
            w += rng.choice(["&amp;", "&lt;", "&gt;", "&quot;", "&apos;",
                             "&nbsp;", "&#65;", "&#x42;", "&zzz;"])
        elif r < 0.09:
            w += rng.choice([",", ".", "!", "?", ":"])
        out.append(w)
    return " ".join(out)


def attrs(rng):
    r = rng.random()
    if r < 0.5:
        return ""
    bits = []
    if rng.random() < 0.6:
        bits.append('class="%s %s"' % (rng.choice(WORDS), rng.choice(WORDS)))
    if rng.random() < 0.4:
        bits.append('href="x?a=1&amp;b=%d"' % rng.randint(0, 99))
    if rng.random() < 0.3:  # quoted '>' and '<' must not end the tag
        bits.append("data-x='%s>y<z'" % rng.choice(WORDS))
    return (" " + " ".join(bits)) if bits else ""


def element(rng, depth):
    r = rng.random()
    if depth >= 4 or r < 0.35:
        return words(rng, 2, 8)
    if r < 0.42:
        return "<!-- %s <fake> &amp; -->" % words(rng, 1, 4)
    if r < 0.49:
        tag = rng.choice(["script", "style"])
        return "<%s>var a = 1 < 2 && x > 0; // %s</%s>" % (
            tag, words(rng, 1, 3), tag)
    if r < 0.55:
        return rng.choice(["<br/>", "<br>", '<img src="p.png"/>'])
    inline = r < 0.70
    tag = (rng.choice(["span", "b", "i", "a", "em", "strong", "code"])
           if inline else
           rng.choice(["p", "div", "li", "ul", "h1", "h2", "h3",
                       "blockquote", "pre", "td", "section"]))
    inner = "".join(element(rng, depth + 1)
                    for _ in range(rng.randint(1, 3)))
    return "<%s%s>%s</%s>" % (tag, attrs(rng), inner, tag)


def boilerplate(rng, tag):
    inner = "".join(element(rng, 2) for _ in range(rng.randint(1, 3)))
    if rng.random() < 0.3:  # nested boilerplate
        inner += "<nav>%s</nav>" % words(rng, 1, 4)
    return "<%s>%s</%s>" % (tag, inner, tag)


def page(doc_id):
    rng = random.Random(doc_id * 9176 + 7)
    body = []
    body.append(boilerplate(rng, "header"))
    if rng.random() < 0.5:
        body.append(boilerplate(rng, "nav"))
    shape = rng.random()
    content = "".join(element(rng, 1) for _ in range(rng.randint(2, 5)))
    if shape < 0.35:
        body.append("<main>%s</main>" % content)
    elif shape < 0.40:
        body.append("<main> \t </main>")  # blank main -> falls through
        body.append("<article>%s</article>" % content)
    elif shape < 0.65:
        body.append("<article>%s</article>" % content)
    else:
        body.append(content)  # neither -> whole-document scope
    if rng.random() < 0.5:
        body.append(boilerplate(rng, "aside"))
    body.append(boilerplate(rng, "footer"))
    html = (
        "<!DOCTYPE html><html><head><title>%s</title>"
        "<style>.x{color:red}</style></head><body>%s</body></html>"
        % (words(rng, 1, 3), "".join(body)))
    return html


def main():
    import os
    os.makedirs(OUT_DIR, exist_ok=True)
    ids, htmls, texts, scopes = [], [], [], []
    for k in range(N_DOCS):
        h = page(k)
        t, s = extract(h)
        ids.append(k)
        htmls.append(h)
        texts.append(t)
        scopes.append(s)
    table = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "html": pa.array(htmls, pa.string()),
        "main_text": pa.array(texts, pa.string()),
        "scope": pa.array(scopes, pa.string()),
    })
    pq.write_table(table, f"{OUT_DIR}/htmldocs.parquet")
    from collections import Counter
    print("wrote", N_DOCS, "docs;", Counter(scopes),
          "avg html len", sum(map(len, htmls)) // N_DOCS,
          "avg text len", sum(map(len, texts)) // N_DOCS)


if __name__ == "__main__":
    main()
