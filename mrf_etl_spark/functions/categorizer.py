"""CPT-code → (procedure_set, procedure_class, procedure_group) categorizer.

The reference applies a ~40-rule Python row function with `.apply`
(src/transformers/categorizer.py:69-254 — canonical copy per SURVEY §7.3-7).
Here the rules are a declarative table from which we generate BOTH a native
Spark `when()` chain (JVM-side, codegen'd — no Python in the hot path) and
an equivalent ANSI-SQL CASE expression (for DuckDB oracles). One rule
table, two renderers → parity by construction.

Semantics preserved from the reference:
  * prefix rules first: 'G*' → HCPCS/Medicare Specific/G-Codes,
    'IME*' → HCPCS/Facility Specific/IME Codes
  * non-integer code → Unknown/Unknown/Unknown
  * numeric ranges, first match wins; codes outside all ranges →
    Other/Miscellaneous/Unspecified (e.g. "01234" → 1234 → Other).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str

# (lo, hi, procedure_set, procedure_class, procedure_group)
# Transcribed semantics of categorizer.py:96-254 (ranges flattened; order
# irrelevant because ranges are disjoint).
CPT_RULES: list[tuple[int, int, str, str, str]] = [
    # Surgery 10000-69999 (categorizer.py:157-190)
    (10000, 17999, "Surgery", "Integumentary System", "Skin Procedures"),
    (18000, 19999, "Surgery", "Integumentary System", "Breast Procedures"),
    (20000, 25999, "Surgery", "Musculoskeletal System", "General Orthopedic"),
    (26000, 29999, "Surgery", "Musculoskeletal System", "Hand/Wrist Surgery"),
    (30000, 32999, "Surgery", "Respiratory System", "Pulmonary Procedures"),
    (33000, 37999, "Surgery", "Cardiovascular System", "Cardiac/Vascular Surgery"),
    (38000, 41999, "Surgery", "Hemic/Lymphatic System", "Blood/Lymph Procedures"),
    (42000, 43999, "Surgery", "Digestive System", "Upper GI Surgery"),
    (44000, 49999, "Surgery", "Digestive System", "Lower GI Surgery"),
    (50000, 54999, "Surgery", "Urinary System", "Urological Surgery"),
    (55000, 59999, "Surgery", "Genital System", "Reproductive Surgery"),
    (60000, 64999, "Surgery", "Endocrine/Nervous System", "Specialized Surgery"),
    (65000, 69999, "Surgery", "Eye/Ear System", "Sensory Surgery"),
    # Radiology 70000-79999 (categorizer.py:113-155)
    (70000, 70559, "Radiology", "Head and Neck Imaging", "Skull and Brain"),
    (70560, 70999, "Radiology", "Head and Neck Imaging", "Spine and Neck"),
    (71000, 71999, "Radiology", "Chest Imaging", "Thoracic Studies"),
    (72000, 72159, "Radiology", "Spine Imaging", "Spinal Radiography"),
    (72160, 72999, "Radiology", "Spine Imaging", "Spinal CT/MRI"),
    (73000, 73225, "Radiology", "Extremity Imaging", "Upper Extremity"),
    (73226, 73999, "Radiology", "Extremity Imaging", "Lower Extremity"),
    (74000, 74999, "Radiology", "Abdomen/GI Imaging", "Abdominal Studies"),
    (75000, 75999, "Radiology", "Vascular Imaging", "Angiography"),
    (76000, 76499, "Radiology", "Other Imaging", "Fluoroscopy"),
    (76500, 76999, "Radiology", "Other Imaging", "Ultrasound"),
    (77000, 77099, "Radiology", "Radiation Oncology", "Treatment Planning"),
    (77100, 77999, "Radiology", "Radiation Oncology", "Treatment Delivery"),
    (78000, 78999, "Radiology", "Nuclear Medicine", "Nuclear Studies"),
    (79000, 79999, "Radiology", "Radiopharmaceutical", "Therapeutic Nuclear"),
    # Pathology & Laboratory 80000-89999 (categorizer.py:216-233)
    (80000, 84999, "Pathology & Laboratory", "Chemistry", "Clinical Chemistry"),
    (85000, 85999, "Pathology & Laboratory", "Hematology", "Blood Studies"),
    (86000, 86999, "Pathology & Laboratory", "Immunology", "Immune System Tests"),
    (87000, 87999, "Pathology & Laboratory", "Microbiology", "Infectious Disease"),
    (88000, 88999, "Pathology & Laboratory", "Anatomic Pathology", "Tissue Studies"),
    (89000, 89999, "Pathology & Laboratory", "Other Laboratory", "Miscellaneous Lab"),
    # Medicine 90000-98999 (categorizer.py:235-260)
    (90000, 90999, "Medicine", "Immunizations", "Vaccines and Injections"),
    (91000, 91999, "Medicine", "Gastroenterology", "GI Procedures"),
    (92000, 92499, "Medicine", "Ophthalmology", "Eye Procedures"),
    (92500, 92999, "Medicine", "Otolaryngology", "ENT Procedures"),
    (93000, 93999, "Medicine", "Cardiovascular", "Cardiac Procedures"),
    (94000, 94999, "Medicine", "Pulmonary", "Lung Function Tests"),
    (95000, 95999, "Medicine", "Neurology", "Neurological Tests"),
    (96000, 96999, "Medicine", "Psychiatry", "Mental Health Services"),
    (97000, 97999, "Medicine", "Physical Medicine", "Rehabilitation"),
    (98000, 98999, "Medicine", "Other Medicine", "Miscellaneous Medicine"),
    # Evaluation & Management 99000-99999 (categorizer.py:192-214)
    (99091, 99091, "Evaluation & Management", "Remote Monitoring", "Digital Health"),
    (99202, 99215, "Evaluation & Management", "Office Visits", "Outpatient E&M"),
    (99221, 99239, "Evaluation & Management", "Hospital Care", "Inpatient E&M"),
    (99242, 99255, "Evaluation & Management", "Consultations", "Consultation E&M"),
    (99281, 99288, "Evaluation & Management", "Emergency Care", "Emergency E&M"),
    (99291, 99292, "Evaluation & Management", "Critical Care", "Intensive Care E&M"),
    (99304, 99318, "Evaluation & Management", "Nursing Facility", "Long-term Care E&M"),
    (99341, 99350, "Evaluation & Management", "Home Visits", "Home Care E&M"),
    (99358, 99499, "Evaluation & Management", "Special Services", "Miscellaneous E&M"),
]

# Catch-all inside 99000-99999 that the explicit E&M ranges above miss
# (categorizer.py:213-214), then the global default (categorizer.py:106-108).
_EM_DEFAULT = ("Evaluation & Management", "Other E&M", "General E&M")
_DEFAULT = ("Other", "Miscellaneous", "Unspecified")
_UNKNOWN = ("Unknown", "Unknown", "Unknown")
_G = ("HCPCS", "Medicare Specific", "G-Codes")
_IME = ("HCPCS", "Facility Specific", "IME Codes")


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def categorize_expr(col: ColumnOrName, level: int) -> Column:
    """Native when()-chain for one output level (0=set, 1=class, 2=group)."""
    code_str = F.trim(_c(col).cast("string"))
    # non-integer strings → null, like int() raising. try_cast, not cast:
    # plain cast THROWS under an ANSI-enabled session ('G0008' killed the
    # round-1 driver run), while try_cast yields null in both modes — same
    # semantics as the oracle's TRY_CAST.
    n = code_str.try_cast("int")
    expr = F.when(code_str.startswith("G"), F.lit(_G[level]))
    expr = expr.when(code_str.startswith("IME"), F.lit(_IME[level]))
    expr = expr.when(n.isNull(), F.lit(_UNKNOWN[level]))
    for lo, hi, *cat in CPT_RULES:
        expr = expr.when(n.between(lo, hi), F.lit(cat[level]))
    expr = expr.when(n.between(99000, 99999), F.lit(_EM_DEFAULT[level]))
    return expr.otherwise(F.lit(_DEFAULT[level]))


def _st(tup) -> Column:
    return F.struct(
        F.lit(tup[0]).alias("s"), F.lit(tup[1]).alias("c"), F.lit(tup[2]).alias("g")
    )


def categorize_struct_chain(code_str: Column, n: Column) -> Column:
    """The rule chain as ONE struct<s,c,g>-valued CASE over two PRE-STAGED
    columns (trimmed code string + its int cast). The callers below stage
    those as real attributes first — a Column expression passed into a
    45-branch chain is otherwise textually duplicated into every condition
    (a 30 KB plan and ~90 re-evaluations per row; staging measured 4× on
    plan size, and one-time codegen compile shrinks with it)."""
    expr = F.when(code_str.startswith("G"), _st(_G))
    expr = expr.when(code_str.startswith("IME"), _st(_IME))
    expr = expr.when(n.isNull(), _st(_UNKNOWN))
    for lo, hi, *cat in CPT_RULES:
        expr = expr.when(n.between(lo, hi), _st(tuple(cat)))
    expr = expr.when(n.between(99000, 99999), _st(_EM_DEFAULT))
    return expr.otherwise(_st(_DEFAULT))


def categorize_struct_expr(col: ColumnOrName) -> Column:
    """One when()-chain yielding struct<s,c,g> from a raw column. Only pass
    a plain attribute here — for expressions, or to get the staging for
    free, use `with_categories`."""
    code_str = F.trim(_c(col).cast("string"))
    return categorize_struct_chain(code_str, code_str.try_cast("int"))


def with_categories(
    df,
    col: ColumnOrName,
    out_cols: tuple[str, str, str] = (
        "procedure_set",
        "procedure_class",
        "procedure_group",
    ),
):
    """Recommended API: stage code_str/code_n as attributes (Catalyst's
    CollapseProject keeps non-cheap multi-referenced producers in their own
    projection, so they evaluate once per row), then derive all three
    output columns from the single struct chain."""
    cs, cn, cat = "_cat_cs", "_cat_cn", "_cat_struct"
    return (
        df.withColumn(cs, F.trim(_c(col).cast("string")))
        .withColumn(cn, F.col(cs).try_cast("int"))
        .withColumn(cat, categorize_struct_chain(F.col(cs), F.col(cn)))
        .withColumn(out_cols[0], F.col(cat)["s"])
        .withColumn(out_cols[1], F.col(cat)["c"])
        .withColumn(out_cols[2], F.col(cat)["g"])
        .drop(cs, cn, cat)
    )


def categorize_columns(col: ColumnOrName) -> dict[str, Column]:
    """The three derived columns keyed by their output names."""
    return {
        "procedure_set": categorize_expr(col, 0),
        "procedure_class": categorize_expr(col, 1),
        "procedure_group": categorize_expr(col, 2),
    }


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def categorize_sql_case(col_sql: str, level: int) -> str:
    """ANSI-SQL CASE expression equivalent to `categorize_expr` — used for
    DuckDB oracle parity checks. ``col_sql`` is a SQL expression string."""
    cs = f"trim(CAST({col_sql} AS VARCHAR))"
    n = f"TRY_CAST({cs} AS INTEGER)"
    lines = [f"CASE WHEN {cs} LIKE 'G%' THEN {_sql_quote(_G[level])}"]
    lines.append(f"WHEN {cs} LIKE 'IME%' THEN {_sql_quote(_IME[level])}")
    lines.append(f"WHEN {n} IS NULL THEN {_sql_quote(_UNKNOWN[level])}")
    for lo, hi, *cat in CPT_RULES:
        lines.append(f"WHEN {n} BETWEEN {lo} AND {hi} THEN {_sql_quote(cat[level])}")
    lines.append(f"WHEN {n} BETWEEN 99000 AND 99999 THEN {_sql_quote(_EM_DEFAULT[level])}")
    lines.append(f"ELSE {_sql_quote(_DEFAULT[level])} END")
    return "\n".join(lines)
