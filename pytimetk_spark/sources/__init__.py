from pytimetk_spark.sources.webpages import generate_webpages
from pytimetk_spark.sources.tables import load_table
