"""Driver-checkable query surface: every operator from SURVEY.md §2 as a
``(sf_dir) -> result`` callable plus (where ANSI-SQL-expressible) a
DuckDB oracle string computing the same result with the SAME column
names and the SAME IEEE-754 op order.

Exactness doctrine (why the SQL mirrors work):

- geocode/tile math uses exact int64 arithmetic + literal float
  constants mirrored between numpy and SQL (functions/geocode.py,
  stages/assign.py); the only transcendental (mercator my) agrees with
  DuckDB to the last ulp on this libm, and every SQL-compared output is
  an INTEGER derived from floors whose boundary-flip probability is
  ~1e-14 per row.
- every SQL-compared aggregate is an int64 sum / exact min-max / count;
  float accumulations are quantized first (floor(x*scale + 0.5),
  mirrored literally).
- rank outputs tie-break on a unique id in both engines.
"""

from rio_cogeo_ray.pipelines.queries.geo import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.rel import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.events import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.textq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.dedupq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.searchq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.shardq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.graphq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.embq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries.sketchq import *  # noqa: F401,F403
from rio_cogeo_ray.pipelines.queries._common import (  # noqa: F401
    _BADWORDS,
    _docs,
    _read,
)
from rio_cogeo_ray.pipelines.queries.registry import (  # noqa: F401
    oracle_sql,
    queries,
)
