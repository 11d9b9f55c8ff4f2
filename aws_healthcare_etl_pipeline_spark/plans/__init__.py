"""Named-query registry: the driver-harness surface.

Importing this package populates ``REGISTRY`` with every implemented
query (SURVEY.md §2 inventory + the LLM-data-pipeline extensions).
``__spark_entry__.py`` adapts it to the driver contract.
"""

from .registry import REGISTRY, QuerySpec, query

# import for side effect: each module registers its queries
from . import reference  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import semistructured  # noqa: E402,F401
from . import tpch_wave  # noqa: E402,F401
from . import tpch_wave2  # noqa: E402,F401
from . import windows_analytic  # noqa: E402,F401
from . import windows2  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import llm_text2  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_similarity  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import formats_q  # noqa: E402,F401
from . import multimodal_q  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import analytics3  # noqa: E402,F401
from . import analytics4  # noqa: E402,F401
from . import analytics5  # noqa: E402,F401
from . import analytics6  # noqa: E402,F401
from . import analytics7  # noqa: E402,F401
from . import analytics8  # noqa: E402,F401
from . import analytics9  # noqa: E402,F401
from . import analytics10  # noqa: E402,F401
from . import sqltext  # noqa: E402,F401
from . import streaming_scd  # noqa: E402,F401
from . import analytics11  # noqa: E402,F401
from . import tpch_wave3  # noqa: E402,F401
from . import analytics12  # noqa: E402,F401
from . import analytics13  # noqa: E402,F401
from . import analytics14  # noqa: E402,F401
from . import analytics15  # noqa: E402,F401
from . import analytics16  # noqa: E402,F401
from . import llm_text3  # noqa: E402,F401
from . import formats_q2  # noqa: E402,F401
from . import analytics17  # noqa: E402,F401
from . import analytics18  # noqa: E402,F401
from . import llm_similarity2  # noqa: E402,F401
from . import llm_similarity3  # noqa: E402,F401
from . import analytics20  # noqa: E402,F401
from . import analytics19  # noqa: E402,F401
from . import sqltext2  # noqa: E402,F401
from . import llm_text4  # noqa: E402,F401
from . import analytics21  # noqa: E402,F401
from . import analytics22  # noqa: E402,F401
from . import analytics23  # noqa: E402,F401
from . import analytics24  # noqa: E402,F401
from . import analytics25  # noqa: E402,F401
from . import analytics26  # noqa: E402,F401
from . import analytics27  # noqa: E402,F401
from . import analytics28  # noqa: E402,F401
from . import analytics29  # noqa: E402,F401
from . import analytics30  # noqa: E402,F401
from . import analytics31  # noqa: E402,F401
from . import analytics32  # noqa: E402,F401
from . import analytics33  # noqa: E402,F401
from . import analytics34  # noqa: E402,F401
from . import analytics35  # noqa: E402,F401
from . import analytics36  # noqa: E402,F401
from . import analytics37  # noqa: E402,F401
from . import analytics38  # noqa: E402,F401
from . import analytics39  # noqa: E402,F401
from . import analytics40  # noqa: E402,F401
from . import analytics41  # noqa: E402,F401
from . import analytics42  # noqa: E402,F401
from . import analytics43  # noqa: E402,F401
from . import analytics44  # noqa: E402,F401
from . import analytics45  # noqa: E402,F401
from . import analytics46  # noqa: E402,F401
from . import analytics47  # noqa: E402,F401
from . import analytics48  # noqa: E402,F401
from . import analytics49  # noqa: E402,F401
from . import analytics50  # noqa: E402,F401
from . import analytics51  # noqa: E402,F401
from . import analytics52  # noqa: E402,F401
from . import analytics53  # noqa: E402,F401
from . import analytics54  # noqa: E402,F401
from . import analytics55  # noqa: E402,F401
from . import analytics56  # noqa: E402,F401
from . import analytics57  # noqa: E402,F401
from . import analytics58  # noqa: E402,F401
from . import analytics59  # noqa: E402,F401
from . import analytics60  # noqa: E402,F401
from . import analytics61  # noqa: E402,F401
from . import analytics62  # noqa: E402,F401
from . import analytics63  # noqa: E402,F401
from . import analytics64  # noqa: E402,F401
from . import analytics65  # noqa: E402,F401
from . import analytics66  # noqa: E402,F401
from . import analytics67  # noqa: E402,F401
from . import analytics68  # noqa: E402,F401
from . import analytics69  # noqa: E402,F401
from . import analytics70  # noqa: E402,F401
from . import analytics71  # noqa: E402,F401
from . import analytics72  # noqa: E402,F401
from . import analytics73  # noqa: E402,F401
from . import analytics74  # noqa: E402,F401
from . import analytics75  # noqa: E402,F401
from . import analytics76  # noqa: E402,F401
from . import analytics77  # noqa: E402,F401
from . import analytics78  # noqa: E402,F401
from . import analytics79  # noqa: E402,F401
from . import analytics80  # noqa: E402,F401
from . import analytics81  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
