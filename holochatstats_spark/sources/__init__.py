from holochatstats_spark.sources.chat_logs import (  # noqa: F401
    MESSAGE_SCHEMA,
    read_chat_logs,
)
from holochatstats_spark.sources.video_metadata import (  # noqa: F401
    VIDEO_META_SCHEMA,
    read_video_metadata,
)
from holochatstats_spark.sources.writers import (  # noqa: F401
    export_csv,
    write_month_partitioned,
)
