"""Pipeline orchestration: the end-to-end dedup plan with checkpoint/resume."""
