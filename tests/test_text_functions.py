

def test_script_ratio_and_dominant_script(spark):
    import pytest as _pytest

    from solana_snapshot_etl_tools_spark.functions.text import (
        SCRIPT_PATTERNS,
        dominant_script,
        script_ratio,
    )

    rows = [
        (1, "Hello plain English text"),
        (2, "Привет мир, это русский текст"),
        (3, "你好世界 これはテスト です"),
        (4, "مرحبا بالعالم"),
        (5, "mixed Привет text with more latin letters"),
        (6, "1234 ... !!!"),          # no letters of any script
        (7, ""),
        (8, None),
        (9, "안녕하세요 세계"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    import pyspark.sql.functions as F

    got = {
        r.id: r.s
        for r in df.select("id", dominant_script(F.col("t")).alias("s")).collect()
    }
    assert got == {
        1: "latin", 2: "cyrillic", 3: "cjk", 4: "arabic",
        5: "latin", 6: "unknown", 7: "unknown", 8: "unknown",
        9: "hangul",
    }
    ratios = df.filter("id = 5").select(
        script_ratio(F.col("t"), "latin").alias("lat"),
        script_ratio(F.col("t"), "cyrillic").alias("cyr"),
    ).collect()[0]
    # "mixed...text with more latin letters" vs "Привет": exact counts
    n_lat = sum(c.isalpha() and c.isascii() for c in rows[4][1])
    n_cyr = len("Привет")
    total = n_lat + n_cyr
    assert ratios.lat == _pytest.approx(n_lat / total)
    assert ratios.cyr == _pytest.approx(n_cyr / total)
    # every declared script is a valid argument; unknown scripts raise
    for s in SCRIPT_PATTERNS:
        script_ratio(F.col("t"), s)
    with _pytest.raises(ValueError, match="unknown script"):
        script_ratio(F.col("t"), "klingon")
