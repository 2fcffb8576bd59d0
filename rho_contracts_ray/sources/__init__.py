from .repo_files import (  # noqa: F401
    REPO_FILES_SCHEMA, clean_read_parquet, make_repo_files_table, write_repo_files,
    repo_contract, repos_dim_table, commits_dim_table,
)
