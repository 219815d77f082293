"""sparkcheck — a from-scratch PySpark-native schema + constraint
validation engine with the query capabilities of Great Expectations'
core expectation families, re-architected Spark-first (SURVEY.md).

Public API:
    from sparkcheck import ExpectationSuite, Validator, validate_df
"""

from .suite import ExpectationConfiguration, ExpectationSuite, parse_result_format
from .validator import Validator, validate_df
from .expectations import get_expectation, list_expectations, register_expectation
from .profiler import (
    profile_suite,
    profile_suite_multibatch,
    profile_suite_with_rules,
)
from .quarantine import QuarantineResult, quarantine, tag_failures
from .checkpoint import run_checkpoint
from .fused import validate_and_extract
from .actions import (
    EmailAction,
    FileAlertAction,
    UpdateDataDocsAction,
    ValidationAction,
    WebhookAction,
    register_action,
)

# import registers distribution/referential/stats/keys expectations & metrics
from . import distribution as _distribution  # noqa: F401
from . import referential as _referential  # noqa: F401
from . import stats as _stats  # noqa: F401
from . import keys as _keys  # noqa: F401
from . import temporal as _temporal  # noqa: F401
from . import text as _text  # noqa: F401
from . import infotheory as _infotheory  # noqa: F401
from . import dedup as _dedup  # noqa: F401
from . import sketches as _sketches  # noqa: F401

__all__ = [
    "ExpectationConfiguration",
    "ExpectationSuite",
    "Validator",
    "validate_df",
    "parse_result_format",
    "get_expectation",
    "list_expectations",
    "register_expectation",
    "profile_suite",
    "profile_suite_with_rules",
    "profile_suite_multibatch",
    "QuarantineResult",
    "quarantine",
    "tag_failures",
    "run_checkpoint",
    "validate_and_extract",
    "ValidationAction",
    "FileAlertAction",
    "WebhookAction",
    "EmailAction",
    "UpdateDataDocsAction",
    "register_action",
]

__version__ = "0.1.0"
