"""Title derivation cascade + structural sections (title_util.cpp +
PostIngestQueue::deriveTitle) — hand-computed goldens."""

from __future__ import annotations

from yams_spark.functions.title_util import (
    derive_title,
    derive_title_col,
    detect_document_sections,
    extract_code_signature,
    extract_first_meaningful_line,
    extract_html_title,
    extract_markdown_heading,
    strip_comment_prefix,
)


def test_strip_comment_prefix():
    assert strip_comment_prefix("  // hello") == "hello"
    assert strip_comment_prefix("# heading") == "heading"
    assert strip_comment_prefix("-- sql comment") == "sql comment"
    # '/*' keeps stripping: '/* * text' unwraps twice (:56-62)
    assert strip_comment_prefix("/* * text") == "text"
    assert strip_comment_prefix("*/ tail") == "tail"
    assert strip_comment_prefix("* bullet") == "bullet"
    assert strip_comment_prefix("plain") == "plain"


def test_extractors():
    html = "<head><TITLE>  My   Page </TiTle></head><body>x</body>"
    assert extract_html_title(html) == "My Page"
    assert extract_html_title("<title>unclosed") == ""
    assert extract_html_title("no tag here") == ""
    # scan window: a title past 4096 chars is invisible
    assert extract_html_title("x" * 4100 + "<title>t</title>") == ""
    md = "\n\n   \n## Heading  Two\nbody"
    assert extract_markdown_heading(md) == "Heading Two"
    # non-heading lines do NOT stop the 200-line scan (:111-130)
    assert extract_markdown_heading("no heading\n# late") == "late"
    assert extract_markdown_heading("prose only\nmore prose") == ""
    code = "// copyright\n\nclass FooBar :  public Base {\n"
    assert extract_code_signature(code) == "class FooBar : public Base {"
    assert extract_code_signature("x = 1\n") == ""
    # comment markers UNWRAP (their content counts), they don't skip
    assert extract_first_meaningful_line("// c\nreal line\n") == "c"
    assert extract_first_meaningful_line("//\n\n  real line  \n") == (
        "real line"
    )


def test_derive_title_cascade():
    assert derive_title("", "fallback.txt") == "fallback.txt"
    assert derive_title(
        "<title>T</title>", "f", extension=".html"
    ) == "T"
    # empty html title falls through to the code/line cascade
    assert derive_title(
        "<title></title>first line", "f", mime_type="text/html"
    ) == "<title></title>first line"
    assert derive_title("# H1\nbody", "f", extension=".md") == "H1"
    assert derive_title("def main():\n", "f") == "def main():"
    assert derive_title("   \n\t\n", "f.txt") == "f.txt"
    # markdown heading only fires for markdown docs
    assert derive_title("# not md", "f", extension=".txt") == "not md"


def test_detect_document_sections():
    # NB: truly-empty lines never enter the C++ line array (:209 'if
    # (nl > pos)'), so the blank-line-before-header rule only fires for
    # whitespace-BEARING separator lines — hence the ' ' lines here.
    text = (
        "A Study of Synthetic Corpora\n"
        " \n"
        "INTRODUCTION\n"
        "This corpus is generated deterministically and used for "
        "testing the sectioning heuristics end to end.\n"
        " \n"
        "2 METHODS\n"
        "We apply structural rules.\n"
    )
    out = detect_document_sections(text)
    assert out["title"] == "A Study of Synthetic Corpora"
    assert [s["name"] for s in out["sections"]] == [
        "INTRODUCTION", "2 METHODS",
    ]
    assert out["abstract"].startswith("INTRODUCTION This corpus")
    # no headers -> first-line title + full body
    plain = "just one meaningful line\nand some more prose here\n"
    out2 = detect_document_sections(plain)
    assert out2["title"] == "just one meaningful line"
    assert out2["body"] == plain
    assert detect_document_sections("")["title"] == ""


def test_derive_title_col(spark):
    rows = [
        ("a", "<title>Alpha</title>", "a.html", "text/html", ".html"),
        ("b", "# Beta\nbody", "b.md", "text/markdown", ".md"),
        ("c", "def gamma():", "c.py", "text/plain", ".py"),
        ("d", "", "d.txt", "text/plain", ".txt"),
        ("e", "\n// only comments stripped\nplain", "e.txt", "", ""),
    ]
    df = spark.createDataFrame(
        rows, "k string, text string, name string, mime string, ext string"
    )
    got = {
        r["k"]: r["title"]
        for r in df.select(
            "k",
            derive_title_col("text", "name", "mime", "ext").alias("title"),
        ).collect()
    }
    assert got == {
        "a": "Alpha", "b": "Beta", "c": "def gamma():", "d": "d.txt",
        "e": "only comments stripped",
    }


def test_detect_sections_col_matches_scalar(spark):
    from yams_spark.functions.title_util import detect_sections_col

    texts = [
        "Alpha Report 7\n \nINTRODUCTION\nThis corpus item 7 is "
        "deterministically generated for section tests.\n \n2 METHODS\n"
        "We apply rules 7.\n",
        "just one line 7\nand some more prose follows here always",
        "TITLE LINE AND MORE WORDS 7\n \nOVERVIEW\nshort\n",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["r"].asDict()
        for r in df.select(detect_sections_col("text").alias("r")).collect()
    ]
    by_text = {t: g for t, g in zip(texts, got)}
    for t in texts:
        want = detect_document_sections(t)
        g = by_text[t]
        assert g["title"] == want["title"]
        assert g["abstract"] == want["abstract"]
        assert g["body"] == want["body"]
        assert g["n_sections"] == len(want["sections"])
        assert g["section_names"] == [s["name"] for s in want["sections"]]
