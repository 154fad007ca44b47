SELECT CAST(method AS VARCHAR) AS method, CAST(n_hits AS BIGINT) AS n_hits, CAST(n_total AS BIGINT) AS n_total, CAST(recall AS DOUBLE) AS recall
FROM (VALUES
('ivf',100,100,1.0),
('ivfpq_rerank',100,100,1.0),
('lsh',100,100,1.0)
) AS t(method, n_hits, n_total, recall)
ORDER BY method