"""Column-expression library.

Every scalar transformation the reference implements as a Python UDF is
re-expressed here as a pure Catalyst column expression, so whole-stage
codegen is never broken (SURVEY §2.10, §4 O11).
"""

from cmsspark_spark.functions.cms import (  # noqa: F401
    clean_site_name,
    dn2uuid,
    parse_dn,
    split_dataset,
    tier_from_site,
)
from cmsspark_spark.functions.text import (  # noqa: F401
    bpe_token_count,
    bpe_tokens,
    fingerprint,
    hash_split,
    lang_id,
    mean_token_length,
    pii_redact,
    quality_features,
    raw_ngrams,
    repetition_features,
    rolling_fingerprint,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
)
from cmsspark_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
