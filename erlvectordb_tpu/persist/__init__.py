from erlvectordb_tpu.persist.snapshot import (  # noqa: F401
    PersistenceManager,
    save_store,
    load_store,
    list_persisted,
    delete_persisted,
    get_store_info,
)
from erlvectordb_tpu.persist.backup import (  # noqa: F401
    backup_store,
    restore_store,
    list_backups,
    delete_backup,
    export_store,
    import_store,
    read_backup_manifest,
)
