from dataweb_spark.jobs.manager import (
    CANCELLED,
    COMPLETE,
    FAILED,
    IN_PROGRESS,
    QUEUED,
    JobManager,
    JobNotReady,
    QueryJob,
    QueryTask,
)

__all__ = ["JobManager", "JobNotReady", "QueryJob", "QueryTask",
           "QUEUED", "IN_PROGRESS", "COMPLETE", "FAILED", "CANCELLED"]
