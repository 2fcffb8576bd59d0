from .io import (  # noqa: F401
    clean_read_parquet, ensure_empty_dir, read_table, write_hash_shards,
)
from .repo_files import (  # noqa: F401
    REPO_FILES_SCHEMA, make_repo_files_table, write_repo_files,
    repo_contract, repos_dim_table, commits_dim_table,
)
