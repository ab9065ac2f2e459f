"""HTMLStripCharFilter analog vs the reference's own test vectors
(analysis/common/src/test/.../charfilter/TestHTMLStripCharFilter.java).
Pure-Python: no SparkSession needed."""

import pandas as pd

from lucene_spark.analysis_html import html_strip
from lucene_spark.analysis import tokenize, analyze_batch


def test_basic():
    # TestHTMLStripCharFilter.test()
    html = (
        '<div class="foo">this is some text</div> here is a <a href="#bar">link</a> and '
        'another <a href="http://lucene.apache.org/">link</a>. '
        "This is an entity: &amp; plus a &lt;.  Here is an &. <!-- is a comment -->"
    )
    gold = (
        "\nthis is some text\n here is a link and "
        "another link. "
        "This is an entity: & plus a <.  Here is an &. "
    )
    assert html_strip(html) == gold


def test_gamma_and_entities():
    assert html_strip("&Gamma;", {"reserved"}) == "Γ"
    # testEntities
    assert (
        html_strip("&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;", {"reserved"})
        == "  <foo> Übermensch = Γ bar Γ"
    )
    # testMoreEntities
    assert (
        html_strip("&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;", {"reserved"})
        == "  <junk/>   ! @ and ’"
    )


def test_uppercase_entity_variants():
    assert (
        html_strip(" &QUOT;-&COPY;&GT;>&LT;<&REG;&AMP;")
        == ' "-©>><<®&'
    )


def test_reserved_escaped_tags():
    test = 'aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff <reserved ggg="hhhh"/> <other/>'
    result = html_strip(test, {"reserved"})
    assert result.index("reserved") == 9
    assert result.index("reserved", 15) == 38
    assert result.index("reserved", 41) == 54
    assert "other" not in result


# testMalformedHTML pairs, verbatim from the reference
MALFORMED = [
    ("a <a hr<ef=aa<a>> </close</a>", "a <a hr<ef=aa> </close"),
    (
        '<a href=http://dmoz.org/cgi-bin/add.cgi?where=/arts/" class=lu style="font-size: 9px" target=dmoz>Submit a Site</a>',
        "Submit a Site",
    ),
    (
        "<a href=javascript:ioSwitch('p8','http://www.csmonitor.com/') title=expand id=e8 class=expanded rel=http://www.csmonitor.com/>Christian Science",
        "Christian Science",
    ),
    (
        '<link rel="alternate" type="application/rss+xml" title="San Francisco " 2008 RSS Feed" href="http://2008.sf.wordcamp.org/feed/" />',
        "\n",
    ),
    (
        '<a href=" http://www.surgery4was.happyhost.org/video-of-arthroscopic-knee-surgery symptoms.html, heat congestive heart failure <a href=" http://www.symptoms1bad.happyhost.org/canine',
        '<a href=" http://www.surgery4was.happyhost.org/video-of-arthroscopic-knee-surgery symptoms.html, heat congestive heart failure <a href=" http://www.symptoms1bad.happyhost.org/canine',
    ),
    ('<a href="http://ucblibraries.colorado.edu/how/index.htm"class="pageNavAreaText">', ""),
    (
        '<link title="^\\" 21Sta\'s Blog" rel="search"  type="application/opensearchdescription+xml"  href="http://21sta.com/blog/inc/opensearch.php" />',
        "\n",
    ),
    ('<a href="#postcomment" title=""Leave a comment";">?', "?"),
    (
        "<a href='/modern-furniture'   ' id='21txt' class='offtab'   onMouseout=\"this.className='offtab';  return true;\" onMouseover=\"this.className='ontab';  return true;\">",
        "",
    ),
    (
        "<a href='http://alievi.wordpress.com/category/01-todos-posts/' style='font-size: 275%; padding: 1px; margin: 1px;' title='01 - Todos Post's (83)'>",
        "",
    ),
    (
        'The <a href=<a href="http://www.advancedmd.com>medical">http://www.advancedmd.com>medical</a> practice software</a>',
        'The <a href=medical">http://www.advancedmd.com>medical practice software',
    ),
    (
        '<a href="node/21426" class="clipTitle2" title="Levi.com/BMX 2008 Clip of the Week 29 "Morgan Wade Leftover Clips"">Levi.com/BMX 2008 Clip of the Week 29...',
        "Levi.com/BMX 2008 Clip of the Week 29...",
    ),
    ('<a href="printer_friendly.php?branch=&year=&submit=go&screen=";">Printer Friendly', "Printer Friendly"),
    (
        "<a href=#\" ondragstart=\"return false\" onclick=\"window.external.AddFavorite('http://www.amazingtextures.com', 'Amazing Textures');return false\" onmouseover=\"window.status='Add to Favorites';return true\">Add to Favorites",
        "Add to Favorites",
    ),
    ('<a href="../at_home/at_home_search.html"../_home/at_home_search.html">At', "At"),
    ('E-mail: <a href=""mailto:XXXXXX@example.com" ">XXXXXX@example.com </a>', "E-mail: XXXXXX@example.com "),
    (
        '<li class="farsi"><a title="A\'13?" alt="A\'13?" href="http://www.america.gov/persian" alt="" name="A\'13?"A\'13? title="A\'13?">A\'13?</a></li>',
        "\nA'13?\n",
    ),
    (
        '<li><a href="#28" title="Hubert "Geese" Ausby">Hubert "Geese" Ausby</a></li>',
        '\nHubert "Geese" Ausby\n',
    ),
    ('<href="http://anbportal.com/mms/login.asp">', "\n"),
    ('<a href="', '<a href="'),
    ('<a href=">', ""),
    (
        '<a rel="nofollow" href="http://anissanina31.skyrock.com/1895039493-Hi-tout-le-monde.html" title=" Hi, tout le monde !>#</a>',
        "#",
    ),
    (
        '<a href="http://annunciharleydavidsonusate.myblog.it/" title="Annunci Moto e Accessori Harley Davidson" target="_blank"><img src="http://annunciharleydavidsonusate.myblog.it/images/Antipixel.gif" /></a>',
        "",
    ),
    (
        "<a href=\"video/addvideo&v=120838887181\" onClick=\"return confirm('Are you sure you want  add this video to your profile? If it exists some video in your profile will be overlapped by this video!!')\" \" onmouseover=\"this.className='border2'\" onmouseout=\"this.className=''\">",
        "",
    ),
    ("<a href=#Services & Support>", ""),
    (
        '<area shape="rect" coords="12,153,115,305" href="http://statenislandtalk.com/v-web/gallery/Osmundsen-family"Art\'s Norwegian Roots in Rogaland">',
        "\n",
    ),
    ('<a rel="nofollow" href="http://arth26.skyrock.com/660188240-bonzai.html" title="bonza>#', "#"),
    ("<a href=  >", ""),
    ("<ahref=http:..", "<ahref=http:.."),
    ("<ahref=http:..>", "\n"),
    ('<ahref="http://aseigo.bddf.ca/cms/1025">A', "\nA"),
    (
        "<a href=\"javascript:calendar_window=window.open('/calendar.aspx?formname=frmCalendar.txtDate','calendar_window','width=154,height=188');calendar_window.focus()\">",
        "",
    ),
    ('<a href="/applications/defenseaerospace/19+rackmounts" title="19" Rackmounts">', ""),
    (
        "<a href=http://www.azimprimerie.fr/flash/backup/lewes-zip-code/savage-model-110-manual.html title=savage model 110 manual rel=dofollow>",
        "",
    ),
    (
        '<a class="at" name="Lamborghini  href="http://lamborghini.coolbegin.com">Lamborghini /a>',
        "Lamborghini /a>",
    ),
    (
        "<A href='newslink.php?news_link=http%3A%2F%2Fwww.worldnetdaily.com%2Findex.php%3Ffa%3DPAGE.view%26pageId%3D85729&news_title=Florida QB makes 'John 3:16' hottest Google search Tebow inscribed Bible reference on eye black for championship game' TARGET=_blank>",
        "",
    ),
    ("<a href=/myspace !style='color:#993333'>", ""),
    ("<meta name=3DProgId content=3DExcel.Sheet>", "\n"),
    (
        '<link id=3D"shLink" href=3D"PSABrKelly-BADMINTONCupResults08FINAL2008_09_19=_files/sheet004.htm">',
        "\n",
    ),
    ('<td bgcolor=3D"#FFFFFF" nowrap>', "\n"),
    (
        '<a href="http://basnect.info/usersearch/"predicciones-mundiales-2009".html">"predicciones mundiales 2009"</a>',
        '"predicciones mundiales 2009"',
    ),
    (
        '<a class="comment-link" href="https://www.blogger.com/comment.g?blogID=19402125&postID=114070605958684588"location.href=https://www.blogger.com/comment.g?blogID=19402125&postID=114070605958684588;>',
        "",
    ),
    (
        '<a href = "/videos/Bishop"/" title = "click to see more Bishop" videos">Bishop"</a>',
        'Bishop"',
    ),
    (
        '<a href="http://bhaa.ie/calendar/event.php?eid=20081203150127531"">BHAA Eircom 2 &amp; 5 miles CC combined start</a>',
        "BHAA Eircom 2 & 5 miles CC combined start",
    ),
    (
        '<a href="http://people.tribe.net/wolfmana" onClick=\'setClick("Application[tribe].Person[bb7df210-9dc0-478c-917f-436b896bcb79]")\'" title="Mana">',
        "",
    ),
    (
        '<a  href="http://blog.edu-cyberpg.com/ct.ashx?id=6143c528-080c-4bb2-b765-5ec56c8256d3&url=http%3a%2f%2fwww.gsa.ac.uk%2fmackintoshsketchbook%2f"" eudora="autourl">',
        "",
    ),
    ('<input type="text" value="<search here>">', '<input type="text" value="\n">'),
    ('<input type="text" value="<search here">', '<input type="text" value="\n'),
    # the reference expects "\">" here: value-quote is a plain char, the
    # first '>' ends the (inline, stripped) input tag
    ('<input type="text" value="search here>">', '">'),
]


def test_malformed_html():
    for html, gold in MALFORMED:
        assert html_strip(html) == gold, f"input: {html!r}"


def test_comment():
    # testComment
    assert html_strip("<!--- three dashes, still a valid comment ---> ") == " "
    assert html_strip("<! -- blah > ") == " "
    assert html_strip("<!--" + "x" * 500) == ""


def test_server_side_includes():
    test = (
        'one<img src="image.png"\n'
        " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:<!--comment-->\\'Comment\\'}'  -->\"\n\n"
        ' title="Title: <!--#echo var="IMAGE_CAPTION"-->">two'
    )
    assert html_strip(test) == "onetwo"
    test = 'one<script><!-- <!--#config comment="<!-- \\"comment\\"-->"--> --></script>two'
    assert html_strip(test) == "one\ntwo"


def test_script_quotes():
    test = "one<script attr= bare><!-- action('<!-- comment -->', \"\\\"-->\\\"\"); --></script>two"
    assert html_strip(test) == "one\ntwo"
    test = "hello<script><!-- f('<!--internal--></script>'); --></script>"
    assert html_strip(test) == "hello\n"


def test_escape_script_and_style():
    assert (
        html_strip("one<script no-value-attr>callSomeMethod();</script>two", {"SCRIPT"})
        == "one<script no-value-attr></script>two"
    )
    test = (
        'one<style type="text/css">\n'
        "<!--\n"
        "@import url('http://www.lasletrasdecanciones.com/css.css');\n"
        "-->\n"
        "</style>two"
    )
    assert html_strip(test) == "one\ntwo"
    assert (
        html_strip('one<style type="text/css"> body,font,a { font-family:arial; } </style>two', {"STYLE"})
        == 'one<style type="text/css"></style>two'
    )


def test_br():
    assert html_strip("one<BR />two<br>three") == "one\ntwo\nthree"
    assert html_strip("one<BR some stuff here too>two</BR>") == "one\ntwo\n"
    test = "one<BR class='whatever'>two</\nBR\n>"
    assert html_strip(test, {"BR"}) == test


def test_inline_tags_no_space():
    assert (
        html_strip('one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three')
        == "onetwo2e.three"
    )


def test_cdata_and_bang():
    assert html_strip("<![CDATA[&]]>") == "&"
    assert html_strip("<![endif]") == "<![endif]"
    assert html_strip("a<![CDATA[x < y]]>b") == "ax < yb"


def test_msword_malformed_pi():
    test = 'one<?xml:namespace prefix = o ns = "urn:schemas-microsoft-com:office:office" />two'
    assert html_strip(test) == "onetwo"


def test_supplementary_chars_in_tags():
    test = "one<\U00029b05艱鍟䇹愯瀛>two<瀛愯\U00029b05>three 瀛愯\U00029b05</瀛愯\U00029b05>four</\U00029b05艱鍟䇹愯瀛>five<\U00020000\U00020000>six<\U00020000\U00020000/>seven"
    gold = "one\ntwo\nthree 瀛愯\U00029b05\nfour\nfive\nsix\nseven"
    assert html_strip(test) == gold


def test_offsets_vectors():
    # doTestOffsets backtracking input — verified against the compiled
    # reference lexer: '< X >' is a (block) tag, trailing '< X' at EOF
    # is dropped by the EOF handler, entity fragments stay literal
    assert html_strip("X < &zz >X &# < X > < &l > &g < X") == "X < &zz >X &# \n < &l > &g "
    assert html_strip("hello &#x world") == "hello &#x world"


def test_eof_behaviors():
    # verified against the compiled reference lexer
    assert html_strip("x<div") == "x"
    assert html_strip("x<div ") == "x<div "
    assert html_strip("x</div") == "x"
    assert html_strip("x</div ") == "x</div "
    assert html_strip("x</") == "x</"
    assert html_strip("x<") == "x<"
    assert html_strip("x< ") == "x< "
    assert html_strip("x<a") == "x"
    assert html_strip("x<a/") == "x<a/"
    assert html_strip("<div foo") == "<div foo"
    assert html_strip("</div >y") == "\ny"
    assert html_strip("</div x>y") == "</div x>y"
    # end-of-input char refs are accepted without semicolons
    assert html_strip("x&amp") == "x&"
    assert html_strip("x&gt") == "x>"
    assert html_strip("x&#62") == "x>"
    assert html_strip("x&#x3E") == "x>"
    assert html_strip("x&zz") == "x&zz"
    assert html_strip("x&") == "x&"


def test_leading_space_tags():
    # verified against the compiled reference lexer
    assert html_strip("< X >") == "\n"
    assert html_strip("< div>x</ div>") == "\nx\n"
    assert html_strip("<  p  >y") == "\ny"
    assert html_strip("< a>z</ a>") == "z"


def test_analyzer_chain_integration():
    """html_strip as a char_filters entry feeds the tokenizer in both
    the single-text and the batch (pandas) analysis paths."""
    analyzer = {"char_filters": [{"type": "html_strip"}]}
    text = '<div class="x">Hello <b>World</b></div> &amp; more'
    terms, positions = tokenize(text, analyzer=analyzer)
    assert terms == ["hello", "world", "more"]
    batch = analyze_batch(pd.Series([text, "<p>a&lt;b</p>"]), analyzer=analyzer)
    assert list(batch["terms"][0]) == ["hello", "world", "more"]
    assert list(batch["terms"][1]) == ["a", "b"]
