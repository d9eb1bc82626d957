"""Golden end-to-end tests for the four drop-in pipelines (FIXTURES.md A/B):
raw CSVs shaped like real source exports (including every quirk row) -> full
chain -> expected standardized output."""

import datetime as dt

import pytest

from polars_ad_etl_spark.pipelines import apsl, like_eat, manaboo, podl

APSL_META = """Day,Account name,Campaign name,Ad set name,Ad name,Amount spent (USD),Impressions,Reach,Frequency,Link clicks,Registrations completed,Adds to cart,Checkouts initiated,Purchases,Purchases conversion value
2024-03-01,acct,camp_m,set1,ad1,10.5,1000,800,1.25,30,5,4,3,2,199.99
2024-03-02,acct,camp_m,set1,ad2,20.0,2000,1500,1.33,60,8,7,5,4,399.5
"""

# Second-column ("Account name" pre-Source; post-Source prepend the cleaner's
# positional columns[1] is "By day") Total summary row must be removed.
APSL_TIKTOK = """By Day,Account name,Campaign name,Ad group name,Ad name,Cost,Impressions,Reach,Frequency,Clicks (destination),Adds to cart (website),Checkouts initiated (website),Purchases (website),Purchase value (website)
2024-03-01,tt_acct,camp_t,grp1,vid1.mp4,5.25,500,400,1.1,12,3,2,1,49.99
Total of 2 days,tt_acct,camp_t,grp1,vid,25.25,2500,2000,1.2,60,15,10,5,249.95
2024-03-02,tt_acct,camp_t,grp1,vid2.mp4,7.75,700,600,1.15,20,5,4,2,99.98
"""

# "Average frequency" carries the "-" sentinel; the column itself is unmapped
# in apsl (dropped at projection) but the cleaner still needs it present.
APSL_X = """Time period,Funding source name,Campaign name,Ad group name,Spend,Impressions,Link clicks,Leads,Cart additions,Checkouts initiated,Purchases,Purchases - sale amount,Average frequency
2024-03-01,fund,camp_x,xgrp,15.0,1500,45,6,5,4,3,299.97,-
2024-03-02,fund,camp_x,xgrp,25.0,2500,75,9,8,6,5,499.95,1.8
"""


def _write(tmp_path, files):
    for name, content in files.items():
        (tmp_path / name).write_text(content, encoding="utf-8")
    return tmp_path


def test_apsl_pipeline(spark, tmp_path):
    raw = _write(
        tmp_path,
        {"meta.csv": APSL_META, "tiktok.csv": APSL_TIKTOK, "x.csv": APSL_X},
    )
    out = apsl.run(spark, raw)
    cfg = apsl.config()
    assert out.columns == list(cfg.standard_schema)
    rows = {(r["Source"], r["Day"]): r for r in out.collect()}
    # TikTok Total row removed: 2+2+2 rows survive
    assert len(rows) == 6
    tk = rows[("TikTok", dt.date(2024, 3, 1))]
    assert tk["Amount spent (USD)"] == 5.25
    assert tk["Ad set name"] == "grp1"  # renamed from "Ad group name"
    assert tk["Registrations completed"] is None  # typed-null fill
    x = rows[("X (Twitter)", dt.date(2024, 3, 1))]
    assert x["Account name"] == "fund"  # "Funding source name" renamed
    assert x["Registrations completed"] == 6  # X "Leads" -> Registrations
    assert x["Leads"] is None  # schema "Leads" col is Meta_Lead-only
    m = rows[("Meta", dt.date(2024, 3, 2))]
    assert m["Purchases conversion value"] == 399.5
    assert m["Leads"] is None


def test_manaboo_pipeline(spark, tmp_path):
    meta = """Day,Campaign name,Ad Set Name,Ad name,Gender,Age,Link (ad settings),Amount spent (USD),Impressions,Frequency,Reach,Clicks (all),ThruPlays,3-second video plays,Registrations Completed,Purchases,Purchases conversion value,Video plays
2024-04-01,camp_m,set1,ad1,female,25-34,http://x,12.5,1200,1.2,900,30,10,20,4,2,150.0,40
"""
    x = """Time period,Objective,Campaign name,Spend,Impressions,Average frequency,Total audience reach,Clicks,Video completions,3s/100% video views,Leads,Purchases,Purchases - sale amount,Video views
2024-04-01,traffic,camp_x,22.0,2200,-,1800,55,12,24,6,3,300.0,80
2024-04-02,traffic,camp_x,33.0,3300,2.1,2700,77,15,30,9,4,450.0,120
"""
    out = manaboo.run(spark, _write(tmp_path, {"m.csv": meta, "x.csv": x}))
    rows = {(r["Source"], r["Day"]): r for r in out.collect()}
    assert len(rows) == 3
    # "-" frequency became "0" then cast to 0.0 double
    assert rows[("X (Twitter)", dt.date(2024, 4, 1))]["Frequency"] == 0.0
    assert rows[("X (Twitter)", dt.date(2024, 4, 2))]["Frequency"] == 2.1
    # X "Objective" is fingerprint-only, dropped at projection
    assert "Objective" not in out.columns
    m = rows[("Meta", dt.date(2024, 4, 1))]
    assert m["Link (ad settings)"] == "http://x"


def test_podl_pipeline(spark, tmp_path):
    meta = """Day,Campaign name,Ad Set Name,Ad name,Gender,Age,Amount spent (USD),Impressions,Frequency,Reach,Unique outbound clicks,Link clicks,Video plays,Video plays at 25%,Video plays at 50%,Video plays at 75%,Video plays at 100%,Adds to cart,Checkouts Initiated,Purchases,Purchases conversion value
2024-05-01,camp_m,set1,ad1,male,35-44,9.99,999,1.1,888,11,22,33,30,25,20,15,5,4,3,99.0
"""
    tiktok = """By Day,Campaign name,Ad group name,Ad name,Cost,Impressions,Frequency,Reach,Clicks (destination),Video views,Video views at 25%,Video views at 50%,Video views at 75%,Video views at 100%,Adds to cart (website),Checkouts initiated (website),Purchases (website),Purchase value (website)
2024-05-01,camp_t,grp1,vid1.mp4,4.5,450,1.05,400,9,18,16,14,12,10,2,1,1,25.0
Total of 1 days,camp_t,grp1,vid,4.5,450,1.05,400,9,18,16,14,12,10,2,1,1,25.0
"""
    out = podl.run(spark, _write(tmp_path, {"m.csv": meta, "t.csv": tiktok}))
    rows = {(r["Source"], r["Day"]): r for r in out.collect()}
    assert len(rows) == 2  # Total row removed
    # Website URL declared but mapped by no source -> all-null column (P4)
    assert all(r["Website URL"] is None for r in rows.values())
    t = rows[("TikTok", dt.date(2024, 5, 1))]
    assert t["Video plays at 100%"] == 10  # TikTok funnel renamed
    # podl registers no mp4 cleaner -> suffix preserved
    assert t["Ad name"] == "vid1.mp4"


def test_like_eat_pipeline(spark, tmp_path):
    meta = """일,캠페인 이름,광고 세트 이름,광고 이름,웹사이트 URL,지출 금액 (KRW),노출,빈도,도달,링크 클릭,공유 항목이 포함된 장바구니에 담기,공유 항목이 포함된 구매,공유 항목의 구매 전환값,동영상 25% 재생,동영상 50% 재생,동영상 75% 재생,동영상 95% 재생,동영상 100% 재생,동영상 재생,THRUPLAY
2024-06-01,캠페인A,세트A,광고A,http://k,15000.5,5000,1.5,4000,120,10,5,75000.0,50,40,30,20,10,60,25
"""
    gfa = """기간,연령 및 성별,애셋 그룹 이름,캠페인 이름,총 비용,노출,클릭,구매완료수,장바구니 담기수,구매완료 전환 매출액
2024.06.01.,25~34세 남성,애셋A,캠페인B,22000.0,7000,200,8,15,120000.0
2024.06.02.,50세 이상 여성,애셋A,캠페인B,11000.0,3500,90,3,7,45000.0
2024.06.03.,연령모름 성별모름,애셋A,캠페인B,5000.0,1500,40,1,2,15000.0
"""
    out = like_eat.run(spark, _write(tmp_path, {"meta.csv": meta, "gfa.csv": gfa}))
    cfg = like_eat.config()
    assert out.columns == list(cfg.standard_schema)
    rows = {(r["Source"], r["일"]): r for r in out.collect()}
    assert len(rows) == 4
    g1 = rows[("Naver_GFA", dt.date(2024, 6, 1))]
    assert (g1["연령"], g1["성"]) == ("25-34", "male")
    assert g1["지출 금액 (KRW)"] == 22000.0
    g2 = rows[("Naver_GFA", dt.date(2024, 6, 2))]
    assert (g2["연령"], g2["성"]) == ("50+", "female")
    g3 = rows[("Naver_GFA", dt.date(2024, 6, 3))]
    assert (g3["연령"], g3["성"]) == ("unknown", "unknown")
    m = rows[("Meta_naver", dt.date(2024, 6, 1))]
    assert m["ThruPlay"] == 25  # THRUPLAY capitalized -> Thruplay -> mapped
    assert m["성"] is None  # Meta lacks age/gender -> typed nulls
    # GFA lacks 빈도 -> typed null
    assert g1["빈도"] is None


@pytest.mark.parametrize("mod", [apsl, manaboo, podl, like_eat])
def test_configs_validate(mod):
    cfg = mod.config()
    assert cfg.standard_schema


def _csv_text_to_xlsx(path, csv_text):
    """Re-encode simple CSV fixture text as a minimal real xlsx (numerics as
    number cells, everything else as inline strings)."""
    import zipfile

    def col_letter(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    def cell(ref, v):
        try:
            float(v)
            return f'<c r="{ref}"><v>{v}</v></c>'
        except ValueError:
            return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    rows_xml = []
    for rn, line in enumerate([l for l in csv_text.splitlines() if l], 1):
        cells = "".join(
            cell(f"{col_letter(ci)}{rn}", v)
            for ci, v in enumerate(line.split(","))
        )
        rows_xml.append(f'<row r="{rn}">{cells}</row>')
    parts = {
        "xl/workbook.xml": (
            f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
            '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": (
            f'<worksheet xmlns="{ns}"><sheetData>'
            + "".join(rows_xml)
            + "</sheetData></worksheet>"
        ),
    }
    with zipfile.ZipFile(path, "w") as zf:
        for name, xml in parts.items():
            zf.writestr(name, xml)


def test_apsl_pipeline_with_xlsx_source(spark, tmp_path):
    """Mixed-format ingestion: Meta arrives as a real .xlsx (the reference's
    actual Meta export format), TikTok/X as CSV — identical standardized
    output to the all-CSV golden run."""
    _csv_text_to_xlsx(tmp_path / "meta.xlsx", APSL_META)
    _write(tmp_path, {"tiktok.csv": APSL_TIKTOK, "x.csv": APSL_X})
    out = apsl.run(spark, tmp_path)
    rows = {(r["Source"], r["Day"]): r for r in out.collect()}
    assert len(rows) == 6
    m = rows[("Meta", dt.date(2024, 3, 2))]
    assert m["Amount spent (USD)"] == 20.0
    assert m["Purchases conversion value"] == 399.5
    assert m["Impressions"] == 2000


def test_export_daily_csv_and_xlsx(spark, tmp_path):
    """Export leg: BOM-CSV (reference parity) and xlsx (new sink) both land
    under processed_dir with the date-range filename; xlsx round-trips."""
    from polars_ad_etl_spark.pipelines.export import export_daily
    from polars_ad_etl_spark.sources.tabular import read_excel

    _write(tmp_path, {"meta.csv": APSL_META, "tiktok.csv": APSL_TIKTOK,
                      "x.csv": APSL_X})
    out = apsl.run(spark, tmp_path)

    p_csv = export_daily(out, "apsl", tmp_path)
    assert p_csv.endswith(".csv") and "2024-03-01" in p_csv
    with open(p_csv, "rb") as f:
        assert f.read(3) == b"\xef\xbb\xbf"  # UTF-8 BOM

    p_x = export_daily(out, "apsl", tmp_path, fmt="xlsx")
    assert p_x.endswith(".xlsx")
    back = read_excel(spark, p_x)
    assert back.count() == out.count()
    assert back.columns == out.columns
