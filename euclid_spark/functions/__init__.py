from euclid_spark.functions.hashing import (  # noqa: F401
    DIGEST_PRIME,
    digest_agg,
    digest_term,
    md5_hex,
    stable_hash64,
)
from euclid_spark.functions.vectors import cosine, dot, l2_norm  # noqa: F401
from euclid_spark.functions.text import (  # noqa: F401
    normalized_text,
    shingles,
    words,
)
