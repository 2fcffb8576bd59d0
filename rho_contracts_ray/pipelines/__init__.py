from .repo_files_suite import run_suite, run_suite_checkpointed  # noqa: F401
from .corpus_prep import prep_documents  # noqa: F401
from .snapshot_drift import repo_files_drift  # noqa: F401
