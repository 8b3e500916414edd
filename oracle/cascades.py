"""Plain-Python transcriptions of the reference decision cascades.

Sources (studied read-only; semantics only, no code copied):
* `classificator_extended_paddleocr.py:326-366` + defaults `:49-57`
* `classificator_paddleocr.py:243-269` (blur_low=300 `:39`)
* `classificator_easyocr.py:256-297`
* `dark_document_classifier.py:76-99` (dominated rules preserved)

Float formatting in dark reasons uses ROUND_HALF_UP to match Spark's
`format_string` (java.util.Formatter) so the Spark pipeline and this
oracle emit byte-identical reason strings.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

BLUR_LOW_EXTENDED = 800.0
BLUR_LOW_BASE = 300.0
MIN_ROI_AREA_FRAC = 0.45
SKEW_BAD_DEG = 12.0


def _f1(x: float) -> str:
    """One-decimal HALF_UP formatting (Java Formatter semantics)."""
    return str(Decimal(repr(float(x))).quantize(Decimal("0.1"), ROUND_HALF_UP))


def categorize_extended(
    blur: float, conf_med: float, pct80: float, words: int, density: float,
    roi_frac: float, avg_skew_deg: float, is_table: bool, core_frac: float,
    bbox_area_text_frac: float, conf_iqr: float, line_height_var: float,
    blur_low: float = BLUR_LOW_EXTENDED,
    min_roi_area_frac: float = MIN_ROI_AREA_FRAC,
    skew_bad_deg: float = SKEW_BAD_DEG,
) -> tuple[str, str]:
    if roi_frac < min_roi_area_frac:
        return "trash", "roi<min"
    if avg_skew_deg >= skew_bad_deg:
        return "trash", "skew_bad"
    if conf_med < 25 and pct80 < 0.10:
        return "trash", "ocr_dead"
    if blur < 120 and pct80 < 0.20:
        return "trash", "blur_dead"
    if bbox_area_text_frac < 0.03 and conf_med < 50:
        return "trash", "no_text_content"
    if conf_iqr >= 35 and pct80 < 0.30:
        return "failed", "unstable_ocr"
    if line_height_var > 100 and conf_med < 70:
        return "medium", "irregular_lines"
    if core_frac < 0.12 and pct80 < 0.25 and blur < 260 and conf_med < 55:
        return "trash", "miniature_poor"
    if is_table:
        if conf_med >= 65 and pct80 >= 0.45 and blur >= 800:
            return "good", "table_strong"
        if conf_med >= 55 and pct80 >= 0.30 and blur >= 220:
            return "medium", "table_ok"
        return "failed", "table_weak"
    if (
        conf_med >= 90 and pct80 >= 0.55 and blur >= blur_low
        and bbox_area_text_frac >= 0.15 and conf_iqr <= 20
    ):
        return "good", "text_strong"
    if conf_med >= 70 and pct80 >= 0.35 and bbox_area_text_frac >= 0.05:
        return "medium", "text_ok"
    return "failed", "text_weak"


def categorize_base(
    blur: float, conf_med: float, pct80: float, words: int, density: float,
    roi_frac: float, avg_skew_deg: float, is_table: bool, core_frac: float,
    blur_low: float = BLUR_LOW_BASE,
    min_roi_area_frac: float = MIN_ROI_AREA_FRAC,
    skew_bad_deg: float = SKEW_BAD_DEG,
) -> tuple[str, str]:
    if roi_frac < min_roi_area_frac:
        return "trash", "roi<min"
    if avg_skew_deg >= skew_bad_deg:
        return "trash", "skew_bad"
    if conf_med < 25 and pct80 < 0.10:
        return "trash", "ocr_dead"
    if blur < 120 and pct80 < 0.20:
        return "trash", "blur_dead"
    if core_frac < 0.12 and pct80 < 0.25 and blur < 260 and conf_med < 55:
        return "trash", "miniature_poor"
    if is_table:
        if conf_med >= 65 and pct80 >= 0.45 and blur >= 800:
            return "good", "table_strong"
        if conf_med >= 55 and pct80 >= 0.30 and blur >= 220:
            return "medium", "table_ok"
        return "failed", "table_weak"
    if conf_med >= 90 and pct80 >= 0.55 and blur >= blur_low:
        return "good", "text_strong"
    if conf_med >= 70 and pct80 >= 0.35:
        return "medium", "text_ok"
    return "failed", "text_weak"


def categorize_easyocr(
    blur: float, conf_med: float, pct80: float, words: int, density: float,
    roi_frac: float, avg_skew_deg: float, is_table: bool, core_frac: float,
    blur_low: float = BLUR_LOW_EXTENDED,
    min_roi_area_frac: float = MIN_ROI_AREA_FRAC,
    skew_bad_deg: float = SKEW_BAD_DEG,
) -> tuple[str, str]:
    if roi_frac < min_roi_area_frac:
        return "trash", "roi<min"
    if avg_skew_deg >= skew_bad_deg:
        return "trash", "skew_bad"
    if words < 10 and conf_med < 10 and pct80 < 0.05:
        return "trash", "ocr_dead"
    if blur < 120 and pct80 < 0.10:
        return "trash", "blur_dead"
    if core_frac < 0.12 and pct80 < 0.15 and blur < 260 and conf_med < 20:
        return "trash", "miniature_poor"
    if is_table:
        if conf_med >= 40 and pct80 >= 0.20 and blur >= 800 and words >= 50:
            return "good", "table_strong"
        if conf_med >= 20 and pct80 >= 0.08 and blur >= 220 and words >= 20:
            return "medium", "table_ok"
        if words >= 30:
            return "medium", "table_readable"
        return "failed", "table_weak"
    if conf_med >= 60 and pct80 >= 0.30 and blur >= blur_low:
        return "good", "text_strong"
    if conf_med >= 35 and pct80 >= 0.15 and blur >= 400 and words >= 30:
        return "medium", "text_good"
    if conf_med >= 20 and pct80 >= 0.08 and blur >= 200 and words >= 20:
        return "medium", "text_ok"
    if words >= 50:
        return "medium", "text_readable"
    return "failed", "text_weak"


def is_dark_document(
    mean_brightness: float, dark_pixels_percent: float,
    very_dark_pixels_percent: float, contrast: float,
) -> tuple[bool, str]:
    if mean_brightness < 100:
        return True, f"very_low_brightness ({_f1(mean_brightness)} < 100)"
    if mean_brightness < 220:
        return True, f"medium_low_brightness ({_f1(mean_brightness)} < 220)"
    if mean_brightness < 150 and dark_pixels_percent > 20:
        return True, (
            f"low_brightness_high_dark_pixels (brightness:{_f1(mean_brightness)}"
            f" < 150, dark:{_f1(dark_pixels_percent)}% > 20%)"
        )
    if dark_pixels_percent > 40:
        return True, f"too_many_dark_pixels ({_f1(dark_pixels_percent)}% > 40%)"
    if very_dark_pixels_percent > 25:
        return True, (
            f"too_many_very_dark_pixels ({_f1(very_dark_pixels_percent)}% > 25%)"
        )
    if mean_brightness < 120 and contrast < 20:
        return True, (
            f"low_brightness_low_contrast (brightness:{_f1(mean_brightness)}"
            f" < 120, contrast:{_f1(contrast)} < 20)"
        )
    if contrast < 10:
        return True, f"extremely_low_contrast ({_f1(contrast)} < 10)"
    return False, "normal_brightness"


def categorize_tuning(
    pct80: float, median_ocr_conf: float, bbox_area_text_frac: float,
    conf_iqr: float, line_height_var: float,
    pct80_failed: float, pct80_good: float, conf_failed: float, conf_good: float,
    bbox_failed: float, bbox_good: float, conf_iqr_max: float, line_var_max: float,
) -> str:
    """`tune_extended_classifier.py:81-97`."""
    if (
        pct80 < pct80_failed or median_ocr_conf < conf_failed
        or bbox_area_text_frac < bbox_failed
    ):
        return "failed"
    if conf_iqr > conf_iqr_max and pct80 < 0.4:
        return "failed"
    if line_height_var > line_var_max and median_ocr_conf < 70:
        return "medium"
    if (
        pct80 >= pct80_good and median_ocr_conf >= conf_good
        and bbox_area_text_frac >= bbox_good and conf_iqr <= 25
    ):
        return "good"
    return "medium"


def keep(category: str) -> bool:
    """keep <=> category in {good, medium} (folder action boundary)."""
    return category in ("good", "medium")
