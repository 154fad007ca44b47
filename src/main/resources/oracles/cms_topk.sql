SELECT CAST(token AS VARCHAR) AS token, CAST(exact_cnt AS BIGINT) AS exact_cnt, CAST(cms_cnt AS BIGINT) AS cms_cnt
FROM (VALUES
('join',964,964),
('hash',947,947),
('row',943,943),
('batch',937,937),
('scan',936,936),
('column',934,934),
('customer',934,934),
('filter',933,933),
('small',928,928),
('merge',918,918),
('slow',918,918),
('order',912,912),
('vector',912,912),
('line',910,910),
('data',908,908),
('table',908,908),
('agg',901,901),
('value',897,897),
('key',896,896),
('stream',888,888)
) AS t(token, exact_cnt, cms_cnt)
ORDER BY exact_cnt DESC, token