#!/usr/bin/env python3
"""Writes the hand-authored extraction fixture HTML files.

Each fixture targets one quirk of the reference parser chain
(XmlDoc::getUtf8Content -> Xml::set -> Xml::getText). The expected .txt
outputs are produced by the harness binary (reference code), never by
the Scala engine under test. Re-run: python3 gen_fixtures.py && \
  build/harness --batch ../src/test/resources/reffix
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "reffix")
os.makedirs(OUT, exist_ok=True)

FIX = {}

FIX["f01_basic"] = b"<html><body><p>Hello world.</p></body></html>"
FIX["f02_entities_named"] = b"<p>fish &amp; chips, caf&eacute;, A&lt;B, C&gt;D, say &quot;hi&quot;, &copy; 2014, &frac12; cup</p>"
FIX["f03_entities_numeric"] = b"<p>dec &#233; hex &#xe9; big &#x1F600; zero &#48; upperhex &#XE9; bad &#x; bare &#;</p>"
FIX["f04_entities_invalid"] = b"<p>&bogusname; &amp &ampx; &verylongentityname12; && &; &#999999999;</p>"
FIX["f05_nbsp"] = b"<p>x&nbsp;y&nbsp;&nbsp;z</p>"
FIX["f06_dospecial_tags"] = b"<p>&lt;script&gt;alert(1)&lt;/script&gt; and &quot;quoted&quot;</p>"
FIX["f07_script_quoted_close"] = b"<body>A<script>var s = \"</script>\"; done();</script>B</body>"
FIX["f08_script_linecomment"] = b"<body>A<script>// hidden </script> comment\nvar x=1;</script>B</body>"
FIX["f09_script_blockcomment"] = b"<body>A<script>/* </script> */ var y=2;</script>B</body>"
FIX["f10_script_htmlcomment"] = b"<body>A<script><!-- var z=3; // --></script>B</body>"
FIX["f11_script_cdata"] = b"<body>A<script><![CDATA[ var w = '</script>'; ]]></script>B</body>"
FIX["f12_attr_unclosed_quote"] = b"<p><a href=\"/x title=broken>text</a> after</p>"
FIX["f13_attr_gt_in_quote"] = b"<p><img alt=\"a > b\">visible</p>"
FIX["f14_comment_with_tags"] = b"<body>A<!-- <p>hidden</p> <b>also</b> -->B</body>"
FIX["f15_conditional_comment"] = b"<body>A<![if !IE]>shown?<![endif]>B</body>"
FIX["f16_cdata_body"] = b"<body>A<![CDATA[raw <b>cdata</b> text]]>B</body>"
FIX["f17_select_option"] = b"<body>pick:<select><option>one</option><option>two</option></select>done</body>"
FIX["f18_style"] = b"<body>A<style>p { color: red; }</style>B</body>"
FIX["f19_sup_ordinal"] = b"<p>the 1<sup>st</sup> and 2<sup>nd</sup> and 23<sup>rd</sup> and 4<sup>th</sup> place</p>"
FIX["f20_sup_spaces"] = b"<p>the 5<sup>\n  th\n</sup> day, 6<sup class=\"x\">th</sup> too</p>"
FIX["f21_sup_nodigit"] = b"<p>super<sup>script</sup> text and x<sup>st</sup>ray</p>"
FIX["f22_sup_upper"] = b"<p>21<SUP>ST</SUP> century</p>"
FIX["f23_curly_quotes"] = "<p>don’t ‘single’ “double” ‛weird</p>".encode("utf-8")
FIX["f24_dashes"] = "<p>8–10pm — soft­hyphen</p>".encode("utf-8")
FIX["f25_c1_controls"] = b"<p>a\xc2\x85b\xc2\x9fc</p>"
FIX["f26_unicode_spaces"] = "<p>a b　c d</p>".encode("utf-8")
FIX["f27_invalid_utf8"] = b"<p>lone\xa0cont \xe2\x28\xa1 trunc\xe2\x82 f8\xf9\x80\x80\x80 ok\xc3\xa9</p>"
FIX["f28_breaking_vs_inline"] = b"<body>a<b>b</b>c<span>d</span>e<div>f</div>g<p>h</p>i<br>j</body>"
FIX["f29_title_head"] = b"<html><head><title>The Title</title><meta name=\"x\" content=\"y\"></head><body>body</body></html>"
FIX["f30_self_closing"] = b"<body>a<br/>b<img src=\"x.png\"/>c<hr />d</body>"
FIX["f31_unknown_tags"] = b"<body>a<foo>inside</foo>b<bar:baz>ns</bar:baz>c</body>"
FIX["f32_xml_pi"] = b"<?xml version=\"1.0\"?><body>text</body>"
FIX["f33_doctype"] = b"<!DOCTYPE html><html><body>doc</body></html>"
FIX["f34_table"] = b"<table><tr><td>c1</td><td>c2</td></tr><tr><td>c3</td></tr></table>"
FIX["f35_textarea"] = b"<body>a<textarea>typed <b>stuff</b></textarea>b</body>"
FIX["f36_iframe_marquee"] = b"<body>a<iframe>inner</iframe>b<marquee>scroll</marquee>c</body>"
FIX["f37_entity_nul_160"] = b"<p>x&#0;y and &#160;z</p>"
FIX["f38_entity_no_semi"] = b"<p>end with &amp</p>"
FIX["f39_bare_amp"] = b"<p>a & b &x c</p>"
FIX["f40_tag_soup"] = b"<body><b<i>text</i> more <p<div>deep</div></body>"
FIX["f41_long_attr"] = b"<p><a href=\"/" + b"x" * 300 + b"\">link</a>text</p>"
FIX["f42_single_quote_attr"] = b"<p><a href='/sq' title='it''s'>sq</a>text</p>"
FIX["f43_backslash_url"] = b"<p><a href=\"\\path\\to\\x\">bs</a>text</p>"
FIX["f44_special_in_title"] = b"<head><title>A &lt;b&gt; B</title></head><body>t</body>"
FIX["f45_ws_runs"] = b"<body>  a   b\t\tc\n\n\nd   </body>"
FIX["f46_only_tags"] = b"<html><head></head><body><div></div><br></body></html>"
FIX["f47_emoji"] = "<p>smile \U0001F600 flag \U0001F1FA\U0001F1F8 done</p>".encode("utf-8")
FIX["f48_bom"] = b"\xef\xbb\xbf<body>after bom</body>"
FIX["f49_crlf"] = b"<body>line1\r\nline2\rline3\nline4</body>"
FIX["f50_nul_byte"] = b"<body>before\x00after</body>"
FIX["f51_nested_invisible"] = b"<body>a<script>s1<style>not-style</style>s2</script>b</body>"
FIX["f52_comment_unterminated"] = b"<body>a<!-- never closed\nmore text"
FIX["f53_script_unterminated"] = b"<body>a<script>var x = 1;\nnothing closes"
FIX["f54_deep_entities"] = b"<p>&amp;amp; &amp;lt; double-encoded</p>"
FIX["f55_form_input"] = b"<body>a<form action=\"/f\"><input type=\"text\" value=\"v\"><button>Go</button></form>b</body>"
FIX["f56_h_and_lists"] = b"<h1>H1</h1><h2>H2</h2><ul><li>i1</li><li>i2</li></ul><ol><li>o1</li></ol>"
FIX["f57_pre_code"] = b"<pre>  spaced\n  code</pre><code>x=1</code>"
FIX["f58_mixed_real"] = (
    b"<html><head><title>Host 3 page 7</title></head><body>"
    b"<h1>Host 3 page 7</h1><p>Deterministic body text for host 3 page 7. "
    b"Some entities: fish &amp; chips, caf&eacute;, x&nbsp;y.</p>"
    b"<a href=\"/\">home</a> "
    b"<script>var hidden = '<a href=\"/not-a-link.html\">x</a>';</script>"
    b"</body></html>")
FIX["f59_sup_ordinal_tail"] = b"<p>1<sup>st</sup></p>"
FIX["f60_lt_then_sup_text"] = b"<p>2 < 3<sup>x</sup> ok</p>"

# --- charset fixtures (X7): step-0 conversion paths ---
FIX["f61_cp1252_meta"] = ("<html><head><meta charset=windows-1252></head><body>"
    "caf\xe9 r\xe9sum\xe9 \x93quoted\x94 \x80uro</body></html>").encode("latin-1")
FIX["f62_latin1_sniff"] = "<body>no meta tag here: na\xefve fa\xe7ade \xbd cup</body>".encode("latin-1")
FIX["f63_gb2312_meta"] = ("<html><head><meta http-equiv=\"Content-Type\" "
    "content=\"text/html; charset=gb2312\"></head><body>".encode("ascii")
    + "中文网页内容".encode("gb2312")
    + " mixed ascii</body></html>".encode("ascii"))
FIX["f64_xml_encoding"] = ("<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>"
    "<body>s\xf8ster \xe6ble</body>").encode("latin-1")
FIX["f65_bogus_charset"] = b"<head><meta charset=bogus-nonsense></head><body>fallback utf8</body>"
FIX["f66_utf16le_bom"] = "<body>utf sixteen é世</body>".encode("utf-16-le")  # no BOM prefix here
FIX["f66_utf16le_bom"] = b"\xff\xfe" + "<body>utf sixteen é世</body>".encode("utf-16-le")
FIX["f67_cp1252_undefined"] = "<body>bad byte: [\x81] kept going \xe9</body>".encode("latin-1")
FIX["f68_charset_in_comment"] = b"<body><!-- charset=gb2312 --> plain \xc3\xa9 utf8</body>"
FIX["f69_sjis_meta"] = ("<head><meta charset=shift_jis></head><body>".encode("ascii")
    + "日本語テスト".encode("shift_jis")
    + "</body>".encode("ascii"))

FIX["f70_iso88591_meta_high"] = ("<head><meta charset=iso-8859-1></head>"
    "<body>euro? [\x80] dag [\x86]</body>").encode("latin-1")
FIX["f71_cp1252_meta_undef"] = ("<head><meta charset=windows-1252></head>"
    "<body>undef [\x8d] dag [\x86]</body>").encode("latin-1")

# --- the CJK long tail (r5): Big5 + the EUC-KR alias family + a 4-byte
# GB18030 sequence — pins where iconv (reference) and java.nio (engine)
# could diverge: the reference maps the alias "EUC-KR" to iconv EUC-KR
# but "KS_C_5601-1987" to x-windows-949 (iana_charset.cpp:184-193), and
# CP949 is a superset of EUC-KR on extended hangul.
FIX["f72_big5_meta"] = ("<head><meta charset=big5></head><body>".encode("ascii")
    + "中文測試繁體字網頁".encode("big5")
    + " tail</body>".encode("ascii"))
FIX["f73_euckr_meta"] = ("<head><meta charset=euc-kr></head><body>".encode("ascii")
    + "한국어 테스트 문서 내용".encode("euc_kr")
    + "</body>".encode("ascii"))
# KS_C_5601-1987 label, CP949-EXTENDED bytes: 똠/뷁 are encodable in
# cp949 (UHC extension area) but NOT in strict KS X 1001 euc-kr
FIX["f74_ksc_alias_cp949ext"] = (
    "<head><meta http-equiv=\"Content-Type\" content=\"text/html; "
    "charset=ks_c_5601-1987\"></head><body>".encode("ascii")
    + "똠방각하 뷁".encode("cp949")
    + " end</body>".encode("ascii"))
# euc-kr label over the SAME extended bytes: iconv EUC-KR rejects them
# (bad-byte path) while a 949 decoder accepts — whichever the reference
# does is the golden
FIX["f75_euckr_label_cp949ext"] = (
    "<head><meta charset=euc-kr></head><body>".encode("ascii")
    + "뷁".encode("cp949")
    + " after</body>".encode("ascii"))
FIX["f76_gb18030_4byte"] = ("<head><meta charset=gb18030></head><body>".encode("ascii")
    + "中文 𝄞 四字节".encode("gb18030")
    + "</body>".encode("ascii"))

for name, data in FIX.items():
    with open(os.path.join(OUT, name + ".html"), "wb") as f:
        f.write(data)
print(f"wrote {len(FIX)} fixtures to {OUT}")
