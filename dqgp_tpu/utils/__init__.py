"""Config/CLI, plotting, structured metrics."""
