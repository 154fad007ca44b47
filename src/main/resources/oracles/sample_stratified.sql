WITH sel(doc_id) AS (VALUES
(224),
(348),
(362),
(363),
(459),
(49),
(78),
(132),
(165),
(245),
(109),
(111),
(114),
(179),
(319),
(42),
(160),
(289),
(313),
(316),
(37),
(271),
(272),
(295),
(410)
)
SELECT d.lang, CAST(s.doc_id AS BIGINT) AS doc_id
FROM sel s JOIN documents d ON d.doc_id = s.doc_id
ORDER BY lang, doc_id