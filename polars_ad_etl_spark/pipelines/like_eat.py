"""Like-Eat pipeline — Korean-language Meta-via-Naver + Naver GFA sources,
23-column Korean standard schema. Config data reproduces the reference
pipeline (``scripts/like_eat.py:25-98``). This is the pipeline exercising the
richest cleaners: Naver GFA's combined ``연령 및 성별`` column is split into
normalized ``연령``/``성`` buckets, and ``2026.02.09.``-style dates are
ISO-normalized so the strict Date cast succeeds — a list-valued cleaner entry
applied in order. Headers are capitalized before detection
(``like_eat.py:110``)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from polars_ad_etl_spark.functions.cleaners import (
    clean_naver_gfa_age_gender,
    clean_naver_gfa_date,
)
from polars_ad_etl_spark.plans import MultiSourceAdETL, PipelineConfig
from polars_ad_etl_spark.plans.schema import Date, Float64, Int64, String

_META_NAVER = {
    "일": "일",
    "캠페인 이름": "캠페인 이름",
    "광고 세트 이름": "광고 세트 이름",
    "광고 이름": "광고 이름",
    "웹사이트 url": "웹사이트 URL",
    "지출 금액 (krw)": "지출 금액 (KRW)",
    "노출": "노출",
    "빈도": "빈도",
    "도달": "도달",
    "링크 클릭": "링크 클릭",
    "공유 항목이 포함된 장바구니에 담기": "장바구니 담기",
    "공유 항목이 포함된 구매": "구매",
    "공유 항목의 구매 전환값": "구매 전환값",
    "동영상 25% 재생": "동영상 25% 재생",
    "동영상 50% 재생": "동영상 50% 재생",
    "동영상 75% 재생": "동영상 75% 재생",
    "동영상 95% 재생": "동영상 95% 재생",
    "동영상 100% 재생": "동영상 100% 재생",
    "동영상 재생": "동영상 재생",
    "Thruplay": "ThruPlay",
}

_NAVER_GFA = {
    "기간": "일",
    "애셋 그룹 이름": "광고 세트 이름",
    "캠페인 이름": "캠페인 이름",
    "총 비용": "지출 금액 (KRW)",
    "노출": "노출",
    "클릭": "링크 클릭",
    "구매완료수": "구매",
    "장바구니 담기수": "장바구니 담기",
    "구매완료 전환 매출액": "구매 전환값",
}


def config() -> PipelineConfig:
    return PipelineConfig(
        rename_config={"Meta_naver": _META_NAVER, "Naver_GFA": _NAVER_GFA},
        standard_schema={
            "Source": String,
            "일": Date,
            "캠페인 이름": String,
            "광고 세트 이름": String,
            "광고 이름": String,
            "성": String,
            "연령": String,
            "웹사이트 URL": String,
            "지출 금액 (KRW)": Float64,
            "노출": Int64,
            "빈도": Float64,
            "도달": Int64,
            "링크 클릭": Int64,
            "장바구니 담기": Int64,
            "구매": Int64,
            "구매 전환값": Float64,
            "동영상 25% 재생": Int64,
            "동영상 50% 재생": Int64,
            "동영상 75% 재생": Int64,
            "동영상 95% 재생": Int64,
            "동영상 100% 재생": Int64,
            "동영상 재생": Int64,
            "ThruPlay": Int64,
        },
        source_config={
            "Meta_naver": [
                "공유 항목이 포함된 구매",
                "공유 항목이 포함된 장바구니에 담기",
            ],
            "Naver_GFA": ["연령 및 성별", "애셋 그룹 이름"],
        },
        cleaner_config={
            "Naver_GFA": [clean_naver_gfa_age_gender, clean_naver_gfa_date],
        },
        capitalize=True,
    )


def run(spark: SparkSession, raw_dir: str | Path) -> DataFrame:
    return MultiSourceAdETL(spark, config()).run(raw_dir)
