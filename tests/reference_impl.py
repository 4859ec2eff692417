"""Pure-Python golden implementation of the reference semantics.

This is an independent re-implementation (from the behavioral survey in
SURVEY.md, citations inline) used ONLY to generate expected values for
pytest. The Spark engine must match it exactly.
"""

from __future__ import annotations

import re

from ocr_spark import config


# --- text (T1-T5) -----------------------------------------------------------

def normalize_text(text: str | None) -> str:
    """metrics_calculator.py:280-302"""
    if not text:
        return ""
    return re.sub(r"\s+", " ", text.lower()).strip()


def split_words(text: str | None) -> list[str]:
    return normalize_text(text).split()


def detect_language_ocr(texts: list[str]) -> str:
    """ocr_service.py:632-662 — note [а-я] excludes 'ё' on the lowered text."""
    if not texts:
        return "unknown"
    full = " ".join(texts).lower()
    cyr = sum(1 for ch in full if "а" <= ch <= "я")
    lat = sum(1 for ch in full if "a" <= ch <= "z")
    if cyr > lat:
        return "ru"
    if lat > cyr:
        return "en"
    return "mixed"


def line_counts(line: str) -> tuple[int, int]:
    """pdf_processor.py:304,:436 char counting (includes 'ё' via alphabet)."""
    cyr = sum(
        1
        for ch in line
        if "а" <= ch.lower() <= "я" or ch in "ёйцукенгшщзхъфывапролджэячсмитьбю"
    )
    lat = sum(1 for ch in line if "a" <= ch.lower() <= "z")
    return cyr, lat


def line_language(line: str) -> str:
    """pdf_processor.py:789-797"""
    cyr, lat = line_counts(line)
    if cyr > lat and cyr > 0:
        return "ru"
    if lat > cyr and lat > 0:
        return "en"
    return "mixed"


def text_quality_score(text: str) -> float:
    """ocr_service.py:154-168"""
    if not text:
        return 0.0
    num_alpha = sum(ch.isalpha() for ch in text)
    if num_alpha == 0:
        return 0.0
    cyr = sum("а" <= ch.lower() <= "я" or ch in "ёй" for ch in text)
    cyr_ratio = cyr / max(1, num_alpha)
    words = [w for w in text.split() if any(ch.isalpha() for ch in w)]
    word_density = len(words) / max(1, len(text) / 25)
    length_score = min(len(text) / 1000.0, 1.0)
    return 2.0 * cyr_ratio + 1.0 * word_density + 0.5 * length_score


def correct_ocr_errors(text: str) -> str:
    """ocr_service.py:317-373 — sequential replace in dict order; the
    mixed-word second pass is a no-op after the global char pass."""
    corrections = dict(config.OCR_CHAR_CORRECTIONS)
    corrections.update(config.OCR_WORD_CORRECTIONS)
    out = text
    for wrong, right in corrections.items():
        out = out.replace(wrong, right)
    return out


# --- metrics (M1-M6) --------------------------------------------------------

def _lev(a, b) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def cer(extracted: str, ground_truth: str) -> float:
    """metrics_calculator.py:56-85"""
    if not ground_truth:
        return 1.0 if extracted else 0.0
    e, g = normalize_text(extracted), normalize_text(ground_truth)
    d = _lev(e, g)
    c = d / len(g) if g else 0.0
    return min(c, 1.0)


def wer(extracted: str, ground_truth: str) -> float:
    """metrics_calculator.py:87-119"""
    if not ground_truth:
        return 1.0 if extracted else 0.0
    ew, gw = split_words(extracted), split_words(ground_truth)
    if not gw:
        return 1.0 if ew else 0.0
    return min(_lev(ew, gw) / len(gw), 1.0)


def normalized_levenshtein(extracted: str, ground_truth: str) -> float:
    """metrics_calculator.py:121-154"""
    if not ground_truth and not extracted:
        return 0.0
    e, g = normalize_text(extracted), normalize_text(ground_truth)
    m = max(len(e), len(g))
    if m == 0:
        return 0.0
    return min(_lev(e, g) / m, 1.0)


def exact_match(extracted: str, ground_truth: str) -> float:
    return 1.0 if (extracted or "").strip() == (ground_truth or "").strip() else 0.0


def _set_prf(a: set, b: set) -> tuple[float, float, float]:
    inter = a & b
    p = len(inter) / len(a) if a else 0.0
    r = len(inter) / len(b) if b else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return p, r, f1


def char_metrics(extracted: str, ground_truth: str):
    p, r, f1 = _set_prf(set(normalize_text(extracted)), set(normalize_text(ground_truth)))
    return {"char_precision": p, "char_recall": r, "char_f1": f1}


def word_metrics(extracted: str, ground_truth: str):
    p, r, f1 = _set_prf(set(split_words(extracted)), set(split_words(ground_truth)))
    return {"word_precision": p, "word_recall": r, "word_f1": f1}


def all_metrics(extracted: str, ground_truth: str) -> dict[str, float]:
    out = {
        "cer": cer(extracted, ground_truth),
        "wer": wer(extracted, ground_truth),
        "normalized_levenshtein": normalized_levenshtein(extracted, ground_truth),
        "exact_match": exact_match(extracted, ground_truth),
    }
    out.update(char_metrics(extracted, ground_truth))
    out.update(word_metrics(extracted, ground_truth))
    return out


# --- fields (T6-T11, F4) ----------------------------------------------------

def _clean_field_value(value: str, field: str) -> str:
    """data_extractor.py:110-198"""
    cleaned = value.strip()
    if field == "phone":
        cleaned = re.sub(r"[^\d+]", "", cleaned)
    elif field == "email":
        cleaned = cleaned.lower()
    elif field == "date":
        norm = re.sub(r"[/\-]", ".", cleaned)
        cleaned = norm if re.match(r"\d{1,2}\.\d{1,2}\.\d{2,4}", norm) else cleaned
    elif field == "amount":
        m = re.search(r"(\d+(?:[.,]\d+)?)", cleaned)
        cleaned = m.group(1).replace(",", ".") if m else cleaned
    elif field == "name":
        words = cleaned.split()
        cleaned = " ".join(w[0].upper() + w[1:].lower() for w in words if w)
    return cleaned


def extract_field(text: str, field: str) -> str | None:
    """data_extractor.py:79-108"""
    for pattern in config.FIELD_PATTERNS[field]:
        matches = re.findall(pattern, text, re.IGNORECASE | re.MULTILINE)
        if matches:
            value = matches[0].strip()
            if value:
                return _clean_field_value(value, field)
    return None


def extract_fields(text: str, fields: list[str] | None = None) -> dict[str, str]:
    """data_extractor.py:47-77 + cleanup :200-221"""
    fields = fields or config.DEFAULT_FIELDS
    data = {f: extract_field(text, f) for f in fields}
    return {k: v for k, v in data.items() if v is not None and str(v).strip()}


# --- layout: text path (W5-W10, G1) ----------------------------------------

def are_translation_pair(line1: str, line2: str) -> bool:
    """pdf_processor.py:368-413"""
    n1, n2 = re.findall(r"\d+", line1), re.findall(r"\d+", line2)
    if n1 and n2 and n1 == n2:
        return True
    if line1.startswith(config.NUMBERED_ITEM_PREFIXES) and line2.startswith(
        config.NUMBERED_ITEM_PREFIXES
    ):
        return True
    u1, u2 = line1.upper(), line2.upper()
    for ru, en in config.TRANSLATION_KEYWORD_PAIRS:
        if (ru in u1 and en in u2) or (en in u1 and ru in u2):
            return True
    return False


def is_clear_side_by_side(text: str) -> bool:
    """pdf_processor.py:332-366"""
    lines = text.split("\n")
    if len(lines) < config.SBS_MIN_LINES:
        return False
    pairs = 0
    for i in range(len(lines) - 1):
        l1, l2 = lines[i].strip(), lines[i + 1].strip()
        if not l1 or not l2:
            continue
        if are_translation_pair(l1, l2):
            pairs += 1
    return pairs >= config.SBS_MIN_PAIRS


def create_side_by_side_columns(text: str) -> dict:
    """pdf_processor.py:415-488"""
    russian, english = [], []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        lang = line_language(line)
        if lang == "ru":
            russian.append(line)
        elif lang == "en":
            english.append(line)
    if russian and english:
        cols = [
            {
                "text": "\n".join(russian), "side": "left", "language": "ru",
                "items_count": len(russian), "confidence_avg": config.SBS_CONFIDENCE,
            },
            {
                "text": "\n".join(english), "side": "right", "language": "en",
                "items_count": len(english), "confidence_avg": config.SBS_CONFIDENCE,
            },
        ]
        return {"columns": cols, "columns_count": 2, "has_multiple_columns": True}
    return {"columns": [], "columns_count": 0, "has_multiple_columns": False}


def analyze_text_columns(text: str) -> dict:
    """pdf_processor.py:292-330 — the live path checks ONLY the strict
    side-by-side gate."""
    if is_clear_side_by_side(text):
        return create_side_by_side_columns(text)
    return {"columns": [], "columns_count": 0, "has_multiple_columns": False}


# --- layout: geometry path (W1-W4, G2-G3, A5, F1-F3) ------------------------

def analyze_box_columns(boxes: list[dict], image_width: float) -> list[dict]:
    """ocr_service.py:432-630 over centroid boxes {cx, cy, text, conf}.

    Returns the final column_texts list (text joined in cy order).
    """
    filtered = [b for b in boxes if b["conf"] > config.CONF_LAYOUT]
    columns_info = []
    if len(filtered) >= 2:
        xs = sorted(b["cx"] for b in filtered)
        max_gap, gap_index = 0, 0
        for i in range(len(xs) - 1):
            gap = xs[i + 1] - xs[i]
            if gap > max_gap:
                max_gap, gap_index = gap, i
        if max_gap >= image_width * config.COLUMN_GAP_FRACTION:
            split_x = (xs[gap_index] + xs[gap_index + 1]) / 2
            left = [b for b in filtered if b["cx"] < split_x]
            right = [b for b in filtered if b["cx"] >= split_x]
            if left:
                columns_info.append(
                    {"side": "left", "items": sorted(left, key=lambda b: b["cx"]),
                     "language": detect_language_ocr([b["text"] for b in sorted(left, key=lambda b: b["cx"])])}
                )
            if right:
                columns_info.append(
                    {"side": "right", "items": sorted(right, key=lambda b: b["cx"]),
                     "language": detect_language_ocr([b["text"] for b in sorted(right, key=lambda b: b["cx"])])}
                )
        else:
            ru = [b for b in filtered if detect_language_ocr([b["text"]]) == "ru"]
            en = [b for b in filtered if detect_language_ocr([b["text"]]) == "en"]
            if ru and en:
                ru.sort(key=lambda b: b["cx"])
                en.sort(key=lambda b: b["cx"])
                ru_avg = sum(b["cx"] for b in ru) / len(ru)
                en_avg = sum(b["cx"] for b in en) / len(en)
                if ru_avg < en_avg:
                    columns_info = [
                        {"side": "left", "items": ru, "language": "ru"},
                        {"side": "right", "items": en, "language": "en"},
                    ]
                else:
                    columns_info = [
                        {"side": "left", "items": en, "language": "en"},
                        {"side": "right", "items": ru, "language": "ru"},
                    ]
    # _extract_text_by_columns (ocr_service.py:582-630)
    column_texts = []
    if not columns_info:
        if boxes:
            kept = [b for b in boxes if b["conf"] > config.CONF_LAYOUT]
            all_text = " ".join(b["text"] for b in kept)
            if all_text.strip():
                column_texts.append(
                    {
                        "text": all_text, "side": "single",
                        "language": detect_language_ocr([b["text"] for b in kept]),
                        "items_count": len(kept),
                        "confidence_avg": (sum(b["conf"] for b in kept) / len(kept)) if kept else 0.0,
                    }
                )
        return column_texts
    for col in columns_info:
        items = sorted(col["items"], key=lambda b: b["cy"])
        column_texts.append(
            {
                "text": " ".join(b["text"] for b in items),
                "side": col["side"], "language": col["language"],
                "items_count": len(items),
                "confidence_avg": sum(b["conf"] for b in items) / len(items) if items else 0.0,
            }
        )
    return column_texts


def extract_full_text(boxes: list[dict]) -> str:
    """_extract_text_from_results (ocr_service.py:290-315): conf>0.4, strip,
    OCR-correct, join ' ' in input order."""
    return " ".join(
        correct_ocr_errors(b["text"].strip())
        for b in boxes
        if b["conf"] > config.CONF_TEXT_ASSEMBLY
    )


# --- span pipeline golden (north_rule core) ---------------------------------

_LINK_RE = re.compile(r"<a[^>]*>.*?</a>")


def link_density(text: str | None) -> float:
    t = text or ""
    if not t:
        return 0.0
    link_chars = sum(len(m) for m in _LINK_RE.findall(t))
    return link_chars / len(t)


def word_count(text: str | None) -> int:
    s = (text or "").strip()
    return len(re.split(r"\s+", s)) if s else 0


def is_boilerplate(text: str | None) -> bool:
    ld = link_density(text)
    wc = word_count(text)
    marker = bool(
        re.search(config.BOILERPLATE_MARKER_PATTERN, (text or "").strip())
    )
    return (
        ld > config.BOILERPLATE_MAX_LINK_DENSITY
        or marker
        or (wc < config.BOILERPLATE_MIN_WORDS and ld > 0.0)
    )


def extract_document(doc: dict, drop_boilerplate: bool = True) -> dict:
    """Golden for pipeline.extract_documents on one corpus document."""
    kept = []
    for s in sorted(doc["spans"], key=lambda s: s["offset"]):
        if s["kind"] != "media" and drop_boilerplate and is_boilerplate(s["text"]):
            continue
        kept.append(s)
    spans = [
        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "order": i}
        for i, s in enumerate(kept)
    ]
    extracted_text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
    structured = extract_fields(extracted_text)
    columns = analyze_text_columns(extracted_text)
    return {
        "doc_id": doc["doc_id"],
        "spans": spans,
        "extracted_text": extracted_text,
        "structured_data": structured,
        "columns": columns["columns"],
        "columns_count": columns["columns_count"],
        "has_multiple_columns": columns["has_multiple_columns"],
        "n_spans": len(spans),
        "n_media": sum(1 for s in spans if s["kind"] == "media"),
    }
