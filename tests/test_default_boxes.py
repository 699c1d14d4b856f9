"""TextBoxes-style default-box generation (closed-form column arithmetic;
reference: docs/yushan/textbox.md:25-53 — ratios {1,2,3,5,7,10} × 2
vertical offsets)."""

import math

from pyspark.sql import functions as F

from basicocr_spark.operators.detection import TEXTBOX_RATIOS, default_boxes


def test_default_boxes_closed_form(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, 8.0), (16.0, 8.0, 8.0), (32.0, 0.0, 16.0)],
        "cx double, cy double, cs double",
    )
    out = df.select(
        "cx",
        "cy",
        "cs",
        default_boxes(F.col("cx"), F.col("cy"), F.col("cs")).alias("boxes"),
    ).collect()
    for r in out:
        assert len(r.boxes) == len(TEXTBOX_RATIOS) * 2
        i = 0
        for ratio in TEXTBOX_RATIOS:
            for dy in (0.0, 0.5):
                b = r.boxes[i]
                assert abs(b["x"] - (r.cx + 0.5 * r.cs)) < 1e-9
                assert abs(b["y"] - (r.cy + (0.5 + dy) * r.cs)) < 1e-9
                assert abs(b["w"] - r.cs * math.sqrt(ratio)) < 1e-9
                assert abs(b["h"] - r.cs / math.sqrt(ratio)) < 1e-9
                # area is ratio-invariant: w*h == cs^2
                assert abs(b["w"] * b["h"] - r.cs * r.cs) < 1e-6
                assert abs(b["w"] / b["h"] - ratio) < 1e-9
                i += 1
