"""rho_contracts_ray — a Ray-Data-native contract & constraint validation
engine with the query/data-processing capabilities of rho-contracts
(reference at /root/reference, studied for WHAT it computes, not HOW).

Layers:
  * `c` / `contracts` — the contract algebra (AST, row interpreter,
    vectorized Arrow compiler);
  * `validate` — Dataset-level row-contract validation (map_batches);
  * `constraints` — dataset-level constraints the reference implies but
    never scales: uniqueness, referential integrity, column stats
    (t-digest + HLL), distribution drift, row invariants;
  * `stages` — data-pipeline operators (dedup, text analysis, similarity
    search, multimodal plumbing);
  * `state` — per-partition checkpoint / lineage records and resume.

NOTE: nothing in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py / CLI / test fixtures (driver contract).
"""

from .contracts import (  # noqa: F401
    c,
    Contract,
    ContractLibraryError,
    RowContractError,
    Violation,
    auto_to_contract,
    check_row,
    check_verdict,
    from_example,
    to_contract,
)
from .validate import (  # noqa: F401
    ValidationReport,
    ValidatorStage,
    VIOLATION_SCHEMA,
    filter_valid,
    tag_valid,
    validate,
)

# function-contract surface (SURVEY.md §2.4) — attached here, after the
# contracts package is fully initialised, to avoid an import cycle
from .functions import api_guard as _api_guard  # noqa: E402
from .contracts import jsval as _jsval  # noqa: E402

c.fn = staticmethod(_api_guard.fn)
c.fun = staticmethod(_api_guard.fun)
c.method = staticmethod(_api_guard.method)
c.wrap = staticmethod(_api_guard.wrap)
c.publish = staticmethod(_api_guard.publish)
c.wrapAll = staticmethod(_api_guard.wrap_all)
c.documentModule = staticmethod(_api_guard.document_module)
c.documentType = staticmethod(_api_guard.document_type)
c.setErrorMessageInspectionDepth = staticmethod(
    _jsval.set_error_message_inspection_depth)

wrap = _api_guard.wrap
fn = _api_guard.fn
fun = _api_guard.fun
method = _api_guard.method

__version__ = "0.1.0"
