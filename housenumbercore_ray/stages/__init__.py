"""Ray Data stages — each stage is a callable class (actor pool) or pure
function (stateless tasks) applied via ``Dataset.map_batches``."""
