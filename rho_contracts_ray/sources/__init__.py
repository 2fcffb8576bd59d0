from .io import clean_read_parquet, ensure_empty_dir, read_table  # noqa: F401
from .repo_files import (  # noqa: F401
    REPO_FILES_SCHEMA, make_repo_files_table, write_repo_files,
    repo_contract, repos_dim_table, commits_dim_table,
)
